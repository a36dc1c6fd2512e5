-- Exact interpolated median per group (both engines: sort-based
-- quantile_cont semantics on DOUBLE; the midpoint average of two doubles is
-- IEEE-deterministic, so results hash-match). The approximate path for
-- 100 TB is percentile_approx / t-digest — this is the exact oracle-able
-- form.
SELECT
    event_type,
    median(CAST(value AS DOUBLE)) AS median_value,
    CAST(COUNT(*) AS BIGINT) AS n
FROM events
WHERE value IS NOT NULL
GROUP BY event_type
ORDER BY event_type
