-- Rolling window analytics: per-user running 4-row sum and step delta over
-- the event stream — the batch form of a sliding-window stream aggregate.
-- (ts, event_id) is a unique per-user ordering, so frame contents are
-- deterministic across engines and partitionings.
SELECT
    event_id,
    user_id,
    CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) OVER (
        PARTITION BY user_id ORDER BY ts, event_id
        ROWS BETWEEN 3 PRECEDING AND CURRENT ROW
    ) AS BIGINT) AS roll4_cents,
    CAST(ROUND(value * 100) AS BIGINT) - LAG(CAST(ROUND(value * 100) AS BIGINT), 1, CAST(0 AS BIGINT)) OVER (
        PARTITION BY user_id ORDER BY ts, event_id
    ) AS delta_cents
FROM events
ORDER BY event_id
