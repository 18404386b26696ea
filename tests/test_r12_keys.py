"""Round-12 pins.

Covers the ADVICE r11 finding on the vectorized nearest-centroid
assignment (ls_hadoop_3_0_spark/llm/embeddings.py): a ragged or NULL
embedding vector must degrade to a NULL pred_label/dist2 row — the row
the pre-r11 SQL zip_with/aggregate fold produced — never an np.stack
task failure inside mapInPandas.
"""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ls_hadoop_3_0_spark.llm import embeddings as emb

SF_DIR = os.environ.get("TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def malformed_dir(tmp_path_factory):
    """sf0.001 embeddings + one NULL vector + one 3-dim vector."""
    base = pq.read_table(os.path.join(SF_DIR, "embeddings.parquet"))
    etype = base.schema.field("embedding").type
    extra = pa.table(
        {
            "vec_id": pa.array([1_000_001, 1_000_002], type=pa.int64()),
            "embedding": pa.array([None, [1.0, 2.0, 3.0]], type=etype),
            "label": pa.array([0, 1], type=pa.int32()),
        }
    )
    out = tmp_path_factory.mktemp("r12_malformed")
    pq.write_table(
        pa.concat_tables([base.select(extra.column_names), extra]),
        os.path.join(out, "embeddings.parquet"),
    )
    return str(out)


def test_malformed_embedding_degrades_to_null_row(spark, malformed_dir):
    pdf = emb.knn_centroid_classify(spark, malformed_dir).toPandas()
    assert len(pdf) == 502
    bad = pdf[pdf["vec_id"] >= 1_000_001].set_index("vec_id")
    assert len(bad) == 2
    # Both malformed rows survive with NULL pred/dist2 (not a task
    # failure, not a dropped row).
    assert bad["pred_label"].isna().all()
    assert bad["dist2"].isna().all()
    good = pdf[pdf["vec_id"] < 1_000_001]
    assert good["pred_label"].notna().all()
    assert good["dist2"].notna().all()


def test_wellformed_rows_unchanged_by_degrade_guard(spark, malformed_dir):
    """The guard must not perturb well-formed assignments.

    Centroids on the malformed dir differ slightly (the 3-dim row
    contributes to label 1's first three positions), so compare
    against the clean fixture only for labels the malformed rows never
    touch — their centroid inputs are bit-identical in both runs.
    """
    clean = emb.knn_centroid_classify(spark, SF_DIR).toPandas()
    dirty = emb.knn_centroid_classify(spark, malformed_dir).toPandas()
    c = clean.set_index("vec_id").sort_index()
    d = dirty[dirty["vec_id"] < 1_000_001].set_index("vec_id").sort_index()
    # dist2 to every centroid changes only via label-1's mean; rows
    # whose clean AND dirty prediction is not label 1 must agree on the
    # predicted label set at minimum.
    both_not1 = (c["pred_label"] != 1) & (d["pred_label"] != 1)
    assert both_not1.sum() > 0
    assert (c.loc[both_not1, "pred_label"] == d.loc[both_not1, "pred_label"]).all()
