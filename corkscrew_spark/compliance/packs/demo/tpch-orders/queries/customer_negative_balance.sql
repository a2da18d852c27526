SELECT
    CAST(c_custkey AS STRING)                  AS resource_id,
    c_name                                     AS resource_name,
    'Customer'                                 AS resource_type,
    'tpch-02'                                  AS control_id,
    'Customer negative balance'                AS control_name,
    CASE WHEN c_acctbal < 0 THEN 'WARNING' ELSE 'PASS' END AS status,
    CASE WHEN c_acctbal < 0 THEN 'LOW' ELSE 'INFO' END     AS severity,
    CASE WHEN c_acctbal < 0 THEN 'negative balance' ELSE 'ok' END AS details
FROM customer
