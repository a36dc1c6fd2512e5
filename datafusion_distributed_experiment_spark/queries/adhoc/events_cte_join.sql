-- Analog of the reference's CTE + join repartition test
-- (reference tests/distributed_repartitions.rs:18-37: WITH temp_by_dir AS
--  (...) SELECT ... JOIN weather ...), on the events table.
WITH value_by_type AS (
    SELECT
        event_type,
        SUM(CAST(ROUND(value * 1e4) AS BIGINT)) / 1e4 AS total_value
    FROM events
    WHERE value IS NOT NULL
    GROUP BY event_type
)
SELECT
    e.event_type,
    CAST(COUNT(*) AS BIGINT) AS n,
    v.total_value
FROM events e
JOIN value_by_type v ON e.event_type = v.event_type
WHERE e.value IS NOT NULL
GROUP BY e.event_type, v.total_value
ORDER BY n DESC, e.event_type
