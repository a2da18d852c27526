-- Every resource must carry each required tag key (map_contains_key over
-- the MapType tags column; NULL map counts as missing).
SELECT
    id                          AS resource_id,
    name                        AS resource_name,
    type                        AS resource_type,
    'tag-hygiene-01'            AS control_id,
    'Required tags present'     AS control_name,
    CASE WHEN size(array_except(array(:required_tags), map_keys(coalesce(tags, map())))) = 0
         THEN 'PASS' ELSE 'FAIL' END AS status,
    'MEDIUM'                    AS severity,
    concat('missing=', array_join(
        array_except(array(:required_tags), map_keys(coalesce(tags, map()))), ',')) AS details,
    region                      AS region,
    CASE WHEN size(array_except(array(:required_tags), map_keys(coalesce(tags, map())))) = 0
         THEN NULL ELSE 'Add the missing tag keys' END AS remediation
FROM resources
