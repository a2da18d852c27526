"""KQL translator tests: semantics units + the reference's verbatim
query strings (plugins/azure-provider/resource_graph.go) compiled onto a
local Resources DataFrame."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from corkscrew_spark.kql import KqlError, kql_to_df
from corkscrew_spark.testing import compare_to_oracle


@pytest.fixture(scope="module")
def resources(spark):
    """Synthetic ARG-shaped Resources table with every column the
    reference's QueryAllResources projection expects."""
    rows = [
        ("id-vm1", "vm-alpha", "microsoft.compute/virtualmachines", "eastus",
         "rg-app", "sub1", {"env": "prod", "team": "core"},
         {"hardwareProfile": {"vmSize": "Standard_D2"}},
         "vm", "Standard", "planA", "sys", ["1"], "", "",
         "2024-01-01T00:00:00Z", "2024-06-01T00:00:00Z"),
        ("id-vm2", "vm-beta", "microsoft.compute/virtualmachines", "westus",
         "rg-app", "sub1", {"env": "dev"},
         {"hardwareProfile": {"vmSize": "Standard_D4"}},
         "vm", "Standard", "", "", [], "", "",
         "2024-02-01T00:00:00Z", "2024-05-01T00:00:00Z"),
        ("id-st1", "stacct", "microsoft.storage/storageaccounts", "eastus",
         "rg-data", "sub2", {"env": "prod"},
         {"hardwareProfile": None},
         "StorageV2", "Standard_LRS", "", "", [], "", "",
         "2024-03-01T00:00:00Z", "2024-04-01T00:00:00Z"),
        ("id-misc", "weird", "singlepart", "eastus",
         "rg-app", "sub1", {}, {"hardwareProfile": None},
         "", "", "", "", [], "", "",
         "2024-01-15T00:00:00Z", "2024-01-16T00:00:00Z"),
    ]
    schema = (
        "id string, name string, type string, location string,"
        "resourceGroup string, subscriptionId string,"
        "tags map<string,string>,"
        "properties struct<hardwareProfile: struct<vmSize: string>>,"
        "kind string, sku string, plan string, identity string,"
        "zones array<string>, extendedLocation string, managedBy string,"
        "createdTime string, changedTime string"
    )
    return spark.createDataFrame(rows, schema)


# ---------------------------------------------------------------------------
# Verbatim reference queries
# ---------------------------------------------------------------------------

def test_reference_query_all_resources_verbatim(resources):
    # resource_graph.go:70-76 QueryAllResources — exact string.
    q = """
	Resources
	| project id, name, type, location, resourceGroup, subscriptionId, tags, properties, kind, sku, plan, identity, zones, extendedLocation, managedBy, createdTime, changedTime
	| order by type asc, name asc
	"""
    out = kql_to_df(q, {"Resources": resources})
    assert out.columns == [
        "id", "name", "type", "location", "resourceGroup", "subscriptionId",
        "tags", "properties", "kind", "sku", "plan", "identity", "zones",
        "extendedLocation", "managedBy", "createdTime", "changedTime"]
    names = [r["name"] for r in out.collect()]
    assert names == ["vm-alpha", "vm-beta", "stacct", "weird"]


def test_reference_discover_all_resource_types_verbatim(resources):
    # resource_graph.go:81-106 DiscoverAllResourceTypes — exact string.
    q = """
	Resources
	| summarize
		ResourceCount = count(),
		SampleProperties = any(properties),
		Locations = make_set(location),
		ResourceGroups = make_set(resourceGroup)
		by type
	| extend
		Provider = split(type, '/')[0],
		Service = split(type, '/')[1],
		ResourceType = split(type, '/')[2]
	| where isnotempty(Service) and isnotempty(ResourceType)
	| project
		type,
		Provider,
		Service,
		ResourceType,
		ResourceCount,
		SampleProperties,
		Locations,
		ResourceGroups
	| order by Provider asc, Service asc, ResourceType asc
	"""
    rows = kql_to_df(q, {"Resources": resources}).collect()
    # 'singlepart' has no Service/ResourceType → filtered; 2-part types have
    # no [2] → also filtered (matches ARG types provider/service/type).
    assert rows == []

    # With 3-part types the pipeline yields grouped rows.
    three = resources.withColumn(
        "type", F.concat(F.col("type"), F.lit("/default")))
    rows = kql_to_df(q, {"Resources": three}).collect()
    assert [r["Service"] for r in rows] == ["virtualmachines", "storageaccounts"]
    vm = rows[0]
    assert vm["ResourceCount"] == 2
    assert vm["Locations"] == ["eastus", "westus"]  # make_set sorted
    assert vm["SampleProperties"]["hardwareProfile"]["vmSize"] is not None


def test_reference_tag_query_verbatim(resources):
    # resource_graph.go:244-258 QueryResourcesByTags filter shape.
    q = """
	Resources
	| where tags['env'] == 'prod'
	| project id, name, type, location, resourceGroup, subscriptionId, tags, properties
	| order by type asc, name asc
	"""
    names = [r["name"] for r in kql_to_df(q, {"Resources": resources}).collect()]
    assert names == ["vm-alpha", "stacct"]


def test_reference_vm_with_size_pattern(resources):
    # resource_graph.go:489-494 QueryOptimizer vm_with_size — exact string
    # (dynamic properties.hardwareProfile.vmSize path over a struct column).
    q = """
				Resources
				| where type == "microsoft.compute/virtualmachines"
				| extend vmSize = properties.hardwareProfile.vmSize
				| project id, name, location, resourceGroup, vmSize, properties
			"""
    rows = kql_to_df(q, {"Resources": resources}).orderBy("id").collect()
    assert [r["vmSize"] for r in rows] == ["Standard_D2", "Standard_D4"]


def test_reference_relationship_extract_all(resources):
    # resource_graph.go:131-147 relationship discovery core: extract_all
    # over a string column, array_length guard, mv-expand, extract.
    res = resources.withColumn(
        "props_str",
        F.lit('ref /subscriptions/s1/resourceGroups/rg/providers/'
              'Microsoft.Network/interfaces/nic1 end'))
    q = """
	Resources
	| extend ReferencedResources = extract_all(@'\\/subscriptions\\/[^\\/]+\\/resourceGroups\\/[^\\/]+\\/providers\\/[^\\/]+\\/[^\\/]+\\/[^\\/\\s"]+', props_str)
	| where array_length(ReferencedResources) > 0
	| project type, ReferencedResources
	| mv-expand ReferencedResource = ReferencedResources
	| extend ReferencedType = extract(@'\\/providers\\/([^\\/]+\\/[^\\/]+)', 1, tostring(ReferencedResource))
	| where isnotempty(ReferencedType)
	| summarize RelationshipCount = count() by SourceType = type, TargetType = ReferencedType
	| order by RelationshipCount desc, SourceType asc
	"""
    rows = kql_to_df(q, {"Resources": res}).collect()
    assert {(r["SourceType"], r["TargetType"], r["RelationshipCount"])
            for r in rows} == {
        ("microsoft.compute/virtualmachines", "Microsoft.Network/interfaces", 2),
        ("microsoft.storage/storageaccounts", "Microsoft.Network/interfaces", 1),
        ("singlepart", "Microsoft.Network/interfaces", 1),
    }


# ---------------------------------------------------------------------------
# Semantics units
# ---------------------------------------------------------------------------

def test_case_insensitive_operators(resources):
    out = kql_to_df(
        "Resources | where type =~ 'MICROSOFT.COMPUTE/VIRTUALMACHINES' "
        "and name contains 'ALPHA'", {"Resources": resources})
    assert [r["name"] for r in out.collect()] == ["vm-alpha"]


def test_has_matches_whole_terms_only(spark):
    df = spark.createDataFrame(
        [("the quick brown fox",), ("a quicksilver cat",)], "s string")
    got = kql_to_df("T | where s has 'quick' | project s", {"T": df}).collect()
    assert [r["s"] for r in got] == ["the quick brown fox"]


def test_order_by_defaults_descending(spark):
    df = spark.createDataFrame([(1,), (3,), (2,)], "x long")
    got = kql_to_df("T | order by x | project x", {"T": df}).collect()
    assert [r["x"] for r in got] == [3, 2, 1]


def test_top_and_in_and_bangops(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c"), (4, "d")], "x long, s string")
    got = kql_to_df(
        "T | where s in ('a','b','c') and s !in ('c') and x != 1 "
        "| top 1 by x asc", {"T": df}).collect()
    assert [(r["x"], r["s"]) for r in got] == [(2, "b")]


def test_summarize_bare_agg_kusto_name(spark):
    df = spark.createDataFrame([(1,), (2,)], "x long")
    got = kql_to_df("T | summarize count(), sum(x)", {"T": df})
    assert got.columns == ["count_", "sum_"]
    assert got.collect()[0][0] == 2


def test_array_index_oob_is_null(spark):
    df = spark.createDataFrame([("a/b",)], "s string")
    got = kql_to_df(
        "T | extend p = split(s, '/')[5] | project p", {"T": df}).collect()
    assert got[0]["p"] is None


def test_extract_no_match_is_null(spark):
    df = spark.createDataFrame([("abc",)], "s string")
    got = kql_to_df(
        "T | extend d = extract(@'(\\d+)', 1, s) | project d", {"T": df}
    ).collect()
    assert got[0]["d"] is None


def test_datetime_literals_quoted_and_unquoted(spark):
    df = spark.createDataFrame(
        [(1, "2024-05-01 00:00:00"), (2, "2023-01-01 00:00:00")],
        "id long, ts string").withColumn("ts", F.col("ts").cast("timestamp"))
    for q in (
        "T | where ts > datetime(2024-01-01T00:00:00Z) | project id",
        "T | where ts > datetime('2024-01-01T00:00:00Z') | project id",
    ):
        assert [r["id"] for r in kql_to_df(q, {"T": df}).collect()] == [1]


def test_join_renames_clashing_right_columns(spark):
    left = spark.createDataFrame([(1, "l")], "k long, v string")
    right = spark.createDataFrame([(1, "r")], "k long, v string")
    got = kql_to_df(
        "L | join kind=inner ( R ) on k", {"L": left, "R": right})
    assert sorted(got.columns) == ["k", "v", "v1"]
    row = got.collect()[0]
    assert (row["v"], row["v1"]) == ("l", "r")


def test_pipes_inside_strings_not_stage_breaks(spark):
    df = spark.createDataFrame([("a|b",), ("c",)], "s string")
    got = kql_to_df("T | where s == 'a|b' | count", {"T": df}).collect()
    assert got[0]["Count"] == 1


def test_errors_are_kqlerrors(resources):
    with pytest.raises(KqlError, match="unknown table"):
        kql_to_df("Nope | count", {"Resources": resources})
    with pytest.raises(KqlError, match="unsupported operator"):
        kql_to_df("Resources | frobnicate x", {"Resources": resources})
    with pytest.raises(KqlError, match="unsupported function"):
        kql_to_df("Resources | extend x = mystery(1)", {"Resources": resources})


# ---------------------------------------------------------------------------
# Differential (sf0.001) for the registered oracle queries
# ---------------------------------------------------------------------------

@pytest.mark.parametrize(
    "name", ["kql_events_rollup", "kql_docs_tokens", "kql_join_spend"])
def test_kql_queries_match_oracle(spark, sf_dir, name):
    assert compare_to_oracle(spark, name, sf_dir) > 0
