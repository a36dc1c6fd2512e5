-- Analytic-function coverage the reference's corpus lacks: ranking
-- (ROW_NUMBER, NTILE quartiles), relative position (PERCENT_RANK/CUME_DIST,
-- emitted as exact ppm integers so the cross-engine hash compare never sees
-- a raw double), and neighbor access (LEAD with an explicit default).
-- Every function shares ONE window spec -> one user_id shuffle + one sort;
-- (ts, event_id) is a unique per-user ordering, so all outputs are
-- deterministic across engines and partitionings; NULLS FIRST is explicit
-- because the engines' ASC defaults differ (round-13).
SELECT
    event_id,
    user_id,
    CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts NULLS FIRST, event_id NULLS FIRST) AS BIGINT) AS rn,
    CAST(NTILE(4) OVER (PARTITION BY user_id ORDER BY ts NULLS FIRST, event_id NULLS FIRST) AS BIGINT) AS quartile,
    CAST(FLOOR(1e6 * PERCENT_RANK() OVER (PARTITION BY user_id ORDER BY ts NULLS FIRST, event_id NULLS FIRST)) AS BIGINT) AS pct_rank_ppm,
    CAST(FLOOR(1e6 * CUME_DIST() OVER (PARTITION BY user_id ORDER BY ts NULLS FIRST, event_id NULLS FIRST)) AS BIGINT) AS cume_ppm,
    LEAD(event_id, 1, CAST(-1 AS BIGINT)) OVER (PARTITION BY user_id ORDER BY ts NULLS FIRST, event_id NULLS FIRST) AS next_event_id
FROM events
ORDER BY user_id, rn
