-- Log compaction: latest state per key (CDC keep-last). The window-rank
-- predicate is the distributed compaction pattern — one shuffle on the key,
-- per-partition rank, no global sort; (ts, event_id) DESC makes the survivor
-- deterministic under timestamp ties.
WITH ranked AS (
    SELECT
        user_id,
        event_id,
        event_type,
        CAST(ROUND(value * 100) AS BIGINT) AS value_cents,
        ROW_NUMBER() OVER (
            PARTITION BY user_id ORDER BY ts DESC NULLS LAST, event_id DESC NULLS LAST
        ) AS rk
    FROM events
)
SELECT user_id, event_id, event_type, value_cents
FROM ranked
WHERE rk = 1
ORDER BY user_id
