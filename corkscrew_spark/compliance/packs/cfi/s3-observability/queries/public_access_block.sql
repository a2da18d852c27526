-- All four PublicAccessBlock flags must be true; any missing flag FAILs.
SELECT
    id                        AS resource_id,
    name                      AS resource_name,
    type                      AS resource_type,
    's3-obs-03'               AS control_id,
    'Public access fully blocked' AS control_name,
    CASE WHEN extract_json(raw_data, '$.PublicAccessBlock.PublicAccessBlockConfiguration.BlockPublicAcls') = 'true'
          AND extract_json(raw_data, '$.PublicAccessBlock.PublicAccessBlockConfiguration.BlockPublicPolicy') = 'true'
          AND extract_json(raw_data, '$.PublicAccessBlock.PublicAccessBlockConfiguration.IgnorePublicAcls') = 'true'
          AND extract_json(raw_data, '$.PublicAccessBlock.PublicAccessBlockConfiguration.RestrictPublicBuckets') = 'true'
         THEN 'PASS' ELSE 'FAIL' END AS status,
    'CRITICAL'                AS severity,
    concat('block_acls=', safe_json_extract(raw_data, '$.PublicAccessBlock.PublicAccessBlockConfiguration.BlockPublicAcls', 'unset'))
                              AS details,
    region                    AS region,
    CASE WHEN extract_json(raw_data, '$.PublicAccessBlock.PublicAccessBlockConfiguration.BlockPublicAcls') = 'true'
          AND extract_json(raw_data, '$.PublicAccessBlock.PublicAccessBlockConfiguration.BlockPublicPolicy') = 'true'
          AND extract_json(raw_data, '$.PublicAccessBlock.PublicAccessBlockConfiguration.IgnorePublicAcls') = 'true'
          AND extract_json(raw_data, '$.PublicAccessBlock.PublicAccessBlockConfiguration.RestrictPublicBuckets') = 'true'
         THEN NULL ELSE 'Enable every public access block flag' END AS remediation
FROM resources
WHERE service = 's3'
