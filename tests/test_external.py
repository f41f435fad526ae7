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


# Poison tool: fails (rc 3) on any batch containing a sequence with 'X',
# otherwise emits 'name;length' per record — the per-batch failure
# tolerance of the reference (GisaidApiImporter.java:389-410).
_POISON_AWK = [
    "awk",
    '/^>/{name=substr($0,2); next} /X/{exit 3} {print name ";" length($0)}',
]


def test_quarantine_mode_isolates_poison_batch(spark):
    """One poison sequence quarantines its batch_size-row batch — never
    the partition or the job — and healthy batches in the SAME partition
    still produce output (r9 verdict ask #5)."""
    rows = [(f"s{i}", "acgt") for i in range(9)] + [("bad", "acXgt")]
    df = spark.createDataFrame(rows, "name string, sequence string").coalesce(1)
    out = run_fasta_tool(
        df,
        _POISON_AWK,
        "name string, seq_len int",
        lambda line: (line.split(";")[0], int(line.split(";")[1])),
        on_error="quarantine",
        batch_size=2,
    ).collect()
    ok = {r["name"]: r["seq_len"] for r in out if r["_tool_error"] is None}
    failed = {r["_tool_input_name"]: r["_tool_error"] for r in out if r["_tool_error"]}
    # The poison row sorts into the last batch of the single partition:
    # its batch (2 rows) quarantines, the other 4 batches all succeed.
    assert len(failed) == 2 and "bad" in failed
    assert all("rc=3" in e for e in failed.values())
    assert len(ok) == 8 and all(v == 4 for v in ok.values())
    # Failed rows carry NULL output fields but keep their input identity.
    assert all(r["name"] is None and r["seq_len"] is None
               for r in out if r["_tool_error"])


def test_quarantine_mode_clean_run_matches_fail_mode(spark, seqs):
    clean = run_fasta_tool(
        seqs,
        ["awk", '/^>/{name=substr($0,2); next} {print name ";" length($0)}'],
        "name string, seq_len int",
        lambda line: (line.split(";")[0], int(line.split(";")[1])),
        on_error="quarantine",
    )
    got = {r["name"]: r["seq_len"] for r in clean.collect()}
    assert got == {"s1": 4, "s2": 4, "s3": 4}
    assert clean.filter("_tool_error IS NOT NULL").count() == 0


def test_feed_import_gates_on_tool_failures(spark, tmp_path):
    """Pipeline wiring: a poisoned annotation batch quarantines instead of
    failing the job; the failed rows stay out of the publish, and the
    reference's <5% abort gate trips when the failure rate crosses it."""
    import json

    from pyspark.sql import Row
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from harvester_database_and_automation_spark.operators.publish import read_published
    from harvester_database_and_automation_spark.pipelines.feed_import import run_feed_import
    from harvester_database_and_automation_spark.sources.quarantine import not_null

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("src", T.StringType()),
            T.StructField("payload", T.StringType()),
            T.StructField("seq_len", T.IntegerType()),
        ]
    )
    feed = tmp_path / "feed"
    feed.mkdir()
    # 30 rows; ids 0 and 1 carry the poison marker 'X' (2/30 = 6.7% > 5%).
    with open(feed / "part-0.jsonl", "w") as fh:
        for i in range(30):
            payload = "acXgt" if i < 2 else "acgt"
            fh.write(json.dumps({"doc_id": i, "src": "lab", "payload": payload}) + "\n")

    def annotate(df):
        stats = run_fasta_tool(
            df.select(
                F.col("doc_id").cast("string").alias("name"),
                F.col("payload").alias("sequence"),
            ),
            _POISON_AWK,
            "doc_id long, seq_len int",
            lambda line: (int(line.split(";")[0]), int(line.split(";")[1])),
            on_error="quarantine",
            batch_size=1,  # one row per batch: only the poison rows fail
        )
        ok = stats.filter("_tool_error IS NULL").select("doc_id", "seq_len")
        failed = stats.filter("_tool_error IS NOT NULL").select(
            F.col("_tool_input_name").cast("long").alias("doc_id"),
            "_tool_error",
        )
        return (
            df.drop("seq_len")
            .join(ok, "doc_id", "left")
            .join(failed, "doc_id", "left")
            .select(*[f.name for f in schema.fields], "_tool_error")
        )

    report = run_feed_import(
        spark,
        str(feed),
        str(tmp_path / "tbl"),
        schema,
        keys=["doc_id"],
        metadata_cols=["src"],
        payload_cols=["payload"],
        checks={"src_required": not_null("src")},
        annotate=annotate,
    )
    # The job completed (no task failure), the poison rows are quarantined
    # and unpublished, and the >5% failure rate trips the abort gate.
    assert report.n_tool_failed == 2
    assert report.n_annotated == 28
    assert not report.ok
    published = read_published(spark, str(tmp_path / "tbl"))
    assert published.count() == 28
    assert published.filter("doc_id < 2").count() == 0
    assert published.filter("seq_len IS NULL").count() == 0
