-- Set-operator surface: INTERSECT / EXCEPT / UNION ALL over user cohorts.
-- Spark plans INTERSECT/EXCEPT as left-semi/anti aggregates — same hash
-- shuffles as the equivalent joins, no materialized distinct lists.
WITH big_purchasers AS (
    SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase' AND value > 100
),
big_clickers AS (
    SELECT DISTINCT user_id FROM events WHERE event_type = 'click' AND value > 100
),
big_error_users AS (
    SELECT DISTINCT user_id FROM events WHERE event_type = 'error' AND value > 150
),
clean_whales AS (
    SELECT user_id FROM big_purchasers
    INTERSECT
    SELECT user_id FROM big_clickers
    EXCEPT
    SELECT user_id FROM big_error_users
)
SELECT user_id, 'clean_whale' AS cohort FROM clean_whales
UNION ALL
SELECT user_id, 'big_error' AS cohort FROM big_error_users
ORDER BY cohort, user_id
