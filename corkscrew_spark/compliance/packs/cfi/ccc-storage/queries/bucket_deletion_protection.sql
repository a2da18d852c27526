-- Bucket policy must contain an explicit Deny on s3:DeleteBucket
-- (LIKE-predicate parity with bucket_deletion_protection.sql:37-39).
SELECT
    id                 AS resource_id,
    name               AS resource_name,
    type               AS resource_type,
    'ccc-storage-03'   AS control_id,
    'Bucket deletion protection policy' AS control_name,
    CASE
        WHEN extract_json(raw_data, '$.Policy') LIKE '%s3:DeleteBucket%'
         AND extract_json(raw_data, '$.Policy') LIKE '%Deny%'
        THEN 'PASS' ELSE 'FAIL'
    END                AS status,
    'MEDIUM'           AS severity,
    CASE
        WHEN extract_json(raw_data, '$.Policy') IS NULL THEN 'no bucket policy'
        ELSE 'bucket policy present'
    END                AS details,
    region             AS region,
    NULL               AS remediation
FROM resources
WHERE service = 's3'
