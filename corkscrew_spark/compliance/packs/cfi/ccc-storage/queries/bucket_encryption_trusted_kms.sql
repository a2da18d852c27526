-- SSE must be aws:kms with a key from the :trusted_kms_keys list
-- (untrusted_kms_keys.sql semantics: IN-list + NULL-safe extraction).
SELECT
    id                 AS resource_id,
    name               AS resource_name,
    type               AS resource_type,
    'ccc-storage-02'   AS control_id,
    'Bucket encrypted with trusted KMS key' AS control_name,
    CASE
        WHEN extract_json(raw_data,
            '$.ServerSideEncryptionConfiguration.Rules[0].ApplyServerSideEncryptionByDefault.SSEAlgorithm')
            = 'aws:kms'
         AND extract_json(raw_data,
            '$.ServerSideEncryptionConfiguration.Rules[0].ApplyServerSideEncryptionByDefault.KMSMasterKeyID')
            IN (:trusted_kms_keys)
        THEN 'PASS' ELSE 'FAIL'
    END                AS status,
    'CRITICAL'         AS severity,
    concat('sse=', safe_json_extract(raw_data,
        '$.ServerSideEncryptionConfiguration.Rules[0].ApplyServerSideEncryptionByDefault.SSEAlgorithm',
        'none'))       AS details,
    region             AS region,
    NULL               AS remediation
FROM resources
WHERE service = 's3'
