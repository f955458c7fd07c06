"""Snapshot-pinning semantics without an Iceberg runtime (the sandbox has
no iceberg jar — sources/tables.py documents the per-round check): two
filesystem directories stand in for two table snapshots, and the ledger's
input fingerprint must detect that a resumed run is seeing a DIFFERENT
snapshot than the one it was checkpointed against — re-validating exactly
the partitions whose content changed and skipping the rest.
"""

from __future__ import annotations

import pyarrow.parquet as pq
import pytest

from approximate_anomaly_detection_in_data_streams_spark.checkpoint import (
    run_validation,
)
from approximate_anomaly_detection_in_data_streams_spark.config import DetectorConfig
from approximate_anomaly_detection_in_data_streams_spark.sources.images import (
    ImageTableConfig,
    generate_images,
)
from approximate_anomaly_detection_in_data_streams_spark.sources.tables import (
    iceberg_available,
    load_table,
)
from approximate_anomaly_detection_in_data_streams_spark.validator import (
    ImageValidatorConfig,
)


@pytest.fixture(scope="module")
def snapshots(spark, tmp_path_factory):
    """snapshot v1 and v2 of the same logical table: v2 changes ONE row's
    phash inside the 'raw' partition (what a new Iceberg snapshot with a
    rewritten data file looks like at filesystem level)."""
    base = tmp_path_factory.mktemp("snaps")
    v1 = str(base / "v1.parquet")
    v2 = str(base / "v2.parquet")
    cfg = ImageTableConfig(n=300, seed=23, partitions=4)
    generate_images(spark, cfg).write.mode("overwrite").parquet(v1)

    tbl = pq.read_table(v1).to_pandas()
    mask = tbl["fmt"] == "raw"
    idx = tbl[mask].index[0]
    tbl.loc[idx, "phash"] = int(tbl.loc[idx, "phash"]) ^ 1
    spark.createDataFrame(tbl).write.mode("overwrite").parquet(v2)
    return v1, v2


def test_sandbox_has_no_iceberg_runtime(spark):
    # the seam's parquet fallback is what the rest of this file exercises
    assert not iceberg_available(spark)


def test_load_table_parquet_fallback(spark, snapshots):
    v1, _ = snapshots
    df = load_table(spark, v1, snapshot_id=123, columns=["image_id", "fmt"])
    assert df.columns == ["image_id", "fmt"]  # projection applied
    assert df.count() == 300  # snapshot_id ignored on the parquet route


def test_resume_detects_snapshot_mismatch(spark, snapshots, tmp_path):
    v1, v2 = snapshots
    vcfg = ImageValidatorConfig(
        drift=DetectorConfig(w=100, slide=25, r=40.0, k=4)
    )
    ck = str(tmp_path / "ck")

    ledger1 = run_validation(spark, load_table(spark, v1), ck, cfg=vcfg)
    assert set(ledger1) == {"raw", "qnt", "jpeg"}
    stamps1 = {k: v.finished_at for k, v in ledger1.items()}

    # resume against the SAME snapshot: nothing re-runs
    ledger2 = run_validation(spark, load_table(spark, v1), ck, cfg=vcfg)
    assert {k: v.finished_at for k, v in ledger2.items()} == stamps1

    # resume against the NEW snapshot: only the changed partition
    # re-validates (ledger fingerprint mismatch), the others are pinned
    ledger3 = run_validation(spark, load_table(spark, v2), ck, cfg=vcfg)
    assert ledger3["raw"].finished_at > stamps1["raw"]
    assert ledger3["raw"].input_fingerprint != ledger1["raw"].input_fingerprint
    for k in ("qnt", "jpeg"):
        assert ledger3[k].finished_at == stamps1[k]
