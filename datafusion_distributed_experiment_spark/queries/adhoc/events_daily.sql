-- Batch-mode equivalent of the streaming tumbling-window aggregation
-- (datafusion_distributed_experiment_spark.streaming.windowed_counts): the
-- oracle for the stream path's semantics on bounded input.
SELECT
    date_trunc('day', ts) AS day,
    event_type,
    CAST(COUNT(*) AS BIGINT) AS n_events,
    SUM(CAST(ROUND(value * 1e4) AS BIGINT)) / 1e4 AS total_value
FROM events
GROUP BY date_trunc('day', ts), event_type
ORDER BY day, event_type
