-- OLAP cube: all four grouping sets over (event_type, user bucket) in one
-- pass — Spark plans a single Expand + partial/final aggregate, the same
-- one-scan shape as the ROLLUP hypertable query. GROUPING() disambiguates
-- genuine NULL keys from subtotal rows (a NULL-valued key and a rolled-up
-- key are different facts), and NULLS FIRST pins the one ordering detail
-- where the engines' defaults differ.
SELECT
    event_type,
    user_bucket,
    CAST(GROUPING(event_type) AS BIGINT) AS g_type,
    CAST(GROUPING(user_bucket) AS BIGINT) AS g_bucket,
    CAST(COUNT(*) AS BIGINT) AS n_events,
    SUM(CAST(ROUND(value * 1e4) AS BIGINT)) / 1e4 AS total_value
FROM (
    SELECT event_type, user_id % 10 AS user_bucket, value FROM events
) src
GROUP BY CUBE(event_type, user_bucket)
ORDER BY g_type, g_bucket, event_type NULLS FIRST, user_bucket NULLS FIRST
