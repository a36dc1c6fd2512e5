-- Analog of the reference's distributed-aggregation test query
-- (reference tests/distributed_aggregation.rs:19:
--  SELECT count(*), "RainToday" FROM weather GROUP BY "RainToday" ORDER BY count(*)).
SELECT
    CAST(COUNT(*) AS BIGINT) AS n,
    event_type
FROM events
GROUP BY event_type
ORDER BY n, event_type
