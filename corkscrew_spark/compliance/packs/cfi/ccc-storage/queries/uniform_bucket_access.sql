-- Uniform bucket-level access: all four PublicAccessBlock flags must be
-- true (reference pack control CCC.ObjStor.C02, uniform_bucket_access.sql).
-- NULL-safe: a missing PublicAccessBlockConfiguration reads as 'false'.
WITH flags AS (
    SELECT
        id, name, type, region,
        safe_json_extract(raw_data, '$.PublicAccessBlock.PublicAccessBlockConfiguration.BlockPublicAcls', 'false') = 'true' AS bpa,
        safe_json_extract(raw_data, '$.PublicAccessBlock.PublicAccessBlockConfiguration.BlockPublicPolicy', 'false') = 'true' AS bpp,
        safe_json_extract(raw_data, '$.PublicAccessBlock.PublicAccessBlockConfiguration.IgnorePublicAcls', 'false') = 'true' AS ipa,
        safe_json_extract(raw_data, '$.PublicAccessBlock.PublicAccessBlockConfiguration.RestrictPublicBuckets', 'false') = 'true' AS rpb
    FROM resources
    WHERE service = 's3'
)
SELECT
    id                          AS resource_id,
    name                        AS resource_name,
    type                        AS resource_type,
    'ccc-storage-04'            AS control_id,
    'Uniform bucket-level access' AS control_name,
    CASE WHEN bpa AND bpp AND ipa AND rpb THEN 'PASS' ELSE 'FAIL' END AS status,
    'MEDIUM'                    AS severity,
    concat(
        'missing=',
        array_join(filter(array(
            CASE WHEN NOT bpa THEN 'BlockPublicAcls' END,
            CASE WHEN NOT bpp THEN 'BlockPublicPolicy' END,
            CASE WHEN NOT ipa THEN 'IgnorePublicAcls' END,
            CASE WHEN NOT rpb THEN 'RestrictPublicBuckets' END
        ), x -> x IS NOT NULL), ',')
    )                           AS details,
    region                      AS region,
    CASE WHEN bpa AND bpp AND ipa AND rpb THEN NULL
         ELSE 'Enable all four PublicAccessBlock settings' END AS remediation
FROM flags
