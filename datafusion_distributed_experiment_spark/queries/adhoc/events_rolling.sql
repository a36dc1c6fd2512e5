-- Rolling window analytics: per-user running 4-row sum and step delta over
-- the event stream — the batch form of a sliding-window stream aggregate.
-- (ts, event_id) is a unique per-user ordering, so frame contents are
-- deterministic across engines and partitionings. NULLS FIRST is spelled
-- out (round-13): Spark defaults ASC to NULLS FIRST where DuckDB defaults
-- to NULLS LAST, so a NULL ts silently reordered frames between engines.
SELECT
    event_id,
    user_id,
    CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) OVER (
        PARTITION BY user_id ORDER BY ts NULLS FIRST, event_id NULLS FIRST
        ROWS BETWEEN 3 PRECEDING AND CURRENT ROW
    ) AS BIGINT) AS roll4_cents,
    CAST(ROUND(value * 100) AS BIGINT) - LAG(CAST(ROUND(value * 100) AS BIGINT), 1, CAST(0 AS BIGINT)) OVER (
        PARTITION BY user_id ORDER BY ts NULLS FIRST, event_id NULLS FIRST
    ) AS delta_cents
FROM events
ORDER BY event_id
