-- At least one Enabled lifecycle rule ($.LifecycleConfiguration.Rules[*].Status).
SELECT
    id                        AS resource_id,
    name                      AS resource_name,
    type                      AS resource_type,
    's3-obs-02'               AS control_id,
    'Lifecycle rules configured' AS control_name,
    CASE WHEN extract_json(raw_data, '$.LifecycleConfiguration.Rules[0].Status') = 'Enabled'
         THEN 'PASS' ELSE 'WARNING' END AS status,
    'LOW'                     AS severity,
    concat('first_rule=', safe_json_extract(raw_data, '$.LifecycleConfiguration.Rules[0].Status', 'none'))
                              AS details,
    region                    AS region,
    CASE WHEN extract_json(raw_data, '$.LifecycleConfiguration.Rules[0].Status') = 'Enabled'
         THEN NULL ELSE 'Add a lifecycle rule' END AS remediation
FROM resources
WHERE service = 's3'
