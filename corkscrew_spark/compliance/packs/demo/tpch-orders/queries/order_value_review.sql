SELECT
    CAST(o_orderkey AS STRING)                 AS resource_id,
    concat('order-', CAST(o_orderkey AS STRING)) AS resource_name,
    'Order'                                    AS resource_type,
    'tpch-01'                                  AS control_id,
    'High-value order review'                  AS control_name,
    CASE WHEN o_totalprice > :max_order_value THEN 'FAIL' ELSE 'PASS' END AS status,
    CASE WHEN o_totalprice > :max_order_value THEN 'HIGH' ELSE 'INFO' END AS severity,
    CASE WHEN o_totalprice > :max_order_value
         THEN 'exceeds review threshold' ELSE 'within threshold' END AS details
FROM orders
