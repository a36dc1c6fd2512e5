-- Hypertable-style multi-resolution rollup: one pass produces per-hour,
-- per-day, and per-type grand-total aggregates (the continuous-aggregate
-- shape TimescaleDB materializes). ROLLUP(day, hour) -> Spark plans a
-- single Expand + partial/final aggregate; NULLS FIRST pins the one
-- ordering detail where the engines' defaults differ.
SELECT
    event_type,
    ts_day,
    ts_hour,
    CAST(COUNT(*) AS BIGINT) AS n_events,
    SUM(CAST(ROUND(value * 1e4) AS BIGINT)) / 1e4 AS total_value
FROM (
    SELECT
        event_type,
        date_trunc('day', ts) AS ts_day,
        date_trunc('hour', ts) AS ts_hour,
        value
    FROM events
    WHERE value IS NOT NULL
) buckets
GROUP BY event_type, ROLLUP(ts_day, ts_hour)
ORDER BY event_type, ts_day NULLS FIRST, ts_hour NULLS FIRST
