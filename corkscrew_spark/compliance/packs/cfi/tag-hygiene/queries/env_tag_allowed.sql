-- Environment tag, when present, must come from the allowed set.
SELECT
    id                          AS resource_id,
    name                        AS resource_name,
    type                        AS resource_type,
    'tag-hygiene-02'            AS control_id,
    'Environment tag within allowed values' AS control_name,
    CASE WHEN tags IS NULL OR tags['Environment'] IS NULL THEN 'WARNING'
         WHEN tags['Environment'] IN (:allowed_envs) THEN 'PASS'
         ELSE 'FAIL' END        AS status,
    'LOW'                       AS severity,
    concat('Environment=', coalesce(tags['Environment'], 'unset')) AS details,
    region                      AS region,
    CASE WHEN tags IS NULL OR tags['Environment'] IS NULL THEN 'Set an Environment tag'
         WHEN tags['Environment'] IN (:allowed_envs) THEN NULL
         ELSE 'Use an approved Environment value' END AS remediation
FROM resources
