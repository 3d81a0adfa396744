"""Incremental pipeline execution: Structured Streaming over an append-only
N-Quads directory with checkpoint resume (the reference's one-pass
stream-processing nature + eagerFlushing state scope, re-expressed as
foreachBatch micro-batches)."""

from __future__ import annotations


def _await(q):
    q.awaitTermination(120)


def test_stream_pipeline_incremental_and_resumable(spark, tmp_path):
    from rdf_dataset_fragmenter_js_spark.streaming.fragment import stream_pipeline_spec

    src = tmp_path / "incoming"
    src.mkdir()
    (src / "a.nq").write_text(
        "<http://ex.org/s1> <http://ex.org/p> <http://ex.org/o1> .\n"
        "<http://ex.org/s2> <http://ex.org/p> <http://ex.org/o2> .\n"
    )
    spec = {
        "quadSource": {"@type": "QuadSourceFile", "filePath": str(src)},
        "transformers": [
            {
                "@type": "QuadTransformerReplaceIri",
                "searchRegex": "^http://ex\\.org",
                "replacementString": "http://pods.local",
            }
        ],
        "fragmentationStrategy": {"@type": "FragmentationStrategySubject"},
        "quadSink": {
            "@type": "QuadSinkFile",
            "outputFormat": "parquet",
            "iriToPath": {"^http://pods\\.local/": "frags/"},
        },
    }
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    _await(stream_pipeline_spec(spark, spec, out, ckpt))
    first = spark.read.parquet(out)
    assert first.count() == 2
    assert {r.path for r in first.select("path").distinct().collect()} == {
        "frags/s1",
        "frags/s2",
    }

    # append a new file; a resumed run processes ONLY it (checkpoint skips a.nq)
    (src / "b.nq").write_text(
        "<http://ex.org/s3> <http://ex.org/p> <http://ex.org/o3> .\n"
    )
    _await(stream_pipeline_spec(spark, spec, out, ckpt))
    second = spark.read.parquet(out)
    assert second.count() == 3  # 2 + 1, not 2 + 3 (no reprocessing)
    assert {r.s for r in second.collect()} == {
        "http://pods.local/s1",
        "http://pods.local/s2",
        "http://pods.local/s3",
    }

    # idempotent when nothing new arrived
    _await(stream_pipeline_spec(spark, spec, out, ckpt))
    assert spark.read.parquet(out).count() == 3
