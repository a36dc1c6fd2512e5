-- Top-K per group via window rank: each user's 3 highest-value events.
-- The rank predicate is the distributed top-k pattern (per-partition
-- partial top-k under AQE, no global sort); event_id breaks value ties
-- deterministically.
WITH ranked AS (
    SELECT
        user_id,
        event_id,
        CAST(ROUND(value * 100) AS BIGINT) AS value_cents,
        ROW_NUMBER() OVER (
            PARTITION BY user_id ORDER BY value DESC, event_id
        ) AS rk
    FROM events
    WHERE value IS NOT NULL
)
SELECT user_id, event_id, value_cents, CAST(rk AS BIGINT) AS rk
FROM ranked
WHERE rk <= 3
ORDER BY user_id, rk
