-- Access logging must target a bucket ($.Logging.LoggingEnabled.TargetBucket).
SELECT
    id                        AS resource_id,
    name                      AS resource_name,
    type                      AS resource_type,
    's3-obs-01'               AS control_id,
    'Bucket access logging enabled' AS control_name,
    CASE WHEN extract_json(raw_data, '$.Logging.LoggingEnabled.TargetBucket') IS NOT NULL
         THEN 'PASS' ELSE 'WARNING' END AS status,
    'MEDIUM'                  AS severity,
    concat('log_target=', safe_json_extract(raw_data, '$.Logging.LoggingEnabled.TargetBucket', 'none'))
                              AS details,
    region                    AS region,
    CASE WHEN extract_json(raw_data, '$.Logging.LoggingEnabled.TargetBucket') IS NOT NULL
         THEN NULL ELSE 'Enable server access logging' END AS remediation
FROM resources
WHERE service = 's3'
