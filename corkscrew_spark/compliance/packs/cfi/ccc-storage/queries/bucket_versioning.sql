-- Versioning must be Enabled ($.Versioning.Status), NULL-safe via macros.
SELECT
    id                        AS resource_id,
    name                      AS resource_name,
    type                      AS resource_type,
    'ccc-storage-01'          AS control_id,
    'Bucket versioning enabled' AS control_name,
    CASE WHEN extract_json(raw_data, '$.Versioning.Status') = 'Enabled'
         THEN 'PASS' ELSE 'FAIL' END AS status,
    'HIGH'                    AS severity,
    concat('versioning=', safe_json_extract(raw_data, '$.Versioning.Status', 'none'))
                              AS details,
    region                    AS region,
    CASE WHEN extract_json(raw_data, '$.Versioning.Status') = 'Enabled'
         THEN NULL ELSE 'Enable bucket versioning' END AS remediation
FROM resources
WHERE service = 's3'
