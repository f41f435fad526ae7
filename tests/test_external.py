"""Tests for the S8 external-process map stage (stub tools stand in for
mafft/nextclade, exactly as the reference treats tool output as the
contract)."""

from __future__ import annotations

import pytest

from harvester_database_and_automation_spark.operators.external import run_fasta_tool


@pytest.fixture()
def seqs(spark):
    return spark.createDataFrame(
        [("s1", "acgt"), ("s2", "ttaa"), ("s3", "ggcc")], "name string, sequence string"
    ).repartition(2)


def test_tool_output_rejoined_by_name(spark, seqs):
    # Stub "aligner": uppercase every non-header line (sed), emit FASTA.
    out = run_fasta_tool(
        seqs,
        ["sed", "/^>/!s/.*/\\U&/"],
        "tagged string",
        lambda line: (line,),
    )
    lines = [r["tagged"] for r in out.collect()]
    assert sorted(lines) == [">s1", ">s2", ">s3", "ACGT", "GGCC", "TTAA"]


def test_tool_csv_contract(spark, seqs):
    # Stub "nextclade": awk produces 'name;length' CSV per record.
    out = run_fasta_tool(
        seqs,
        ["awk", '/^>/{name=substr($0,2); next} {print name ";" length($0)}'],
        "name string, seq_len int",
        lambda line: (line.split(";")[0], int(line.split(";")[1])),
    )
    got = {r["name"]: r["seq_len"] for r in out.collect()}
    assert got == {"s1": 4, "s2": 4, "s3": 4}
    # Re-joinable by name against the input frame:
    joined = seqs.join(out, "name")
    assert joined.count() == 3


def test_tool_failure_surfaces(spark, seqs):
    with pytest.raises(Exception, match="failed rc="):
        run_fasta_tool(
            seqs,
            ["sh", "-c", "exit 3"],
            "x string",
            lambda line: (line,),
        ).collect()


def test_empty_partitions_skip_process(spark):
    df = spark.createDataFrame([], "name string, sequence string").repartition(4)
    out = run_fasta_tool(df, ["cat"], "x string", lambda line: (line,))
    assert out.count() == 0
