"""Round checkpointing, lineage, and resume for the screening loop.

Engine-grade version of the reference CLI's per-pass HDF5 snapshots
(/root/reference/screen:91-100, files ``pass-NN.h5`` — write-only, manual
resume): every completed round writes

- the survivor feature frame   → ``<root>/rounds/round=NNNN/data``
- the full importance ranking  → ``<root>/rounds/round=NNNN/importances``
- a lineage record             → appended to ``<root>/_lineage``
  (round, survivor names, row count, per-partition row counts, wall time)
- driver state                 → ``<root>/state.json`` (atomic rename)

``screen(..., checkpoint=ckpt, resume_from=root)`` re-enters the loop after
the last completed round with the recorded survivor set; per-round seed
streams are pre-spawned in ``screen`` so the resumed run replays identical
randomness.

Storage backend: a parquet directory tree by default; when the session has
the ``graft`` Iceberg catalog configured (sources/iceberg.py — requires the
runtime jar, absent in this sandbox), each round's survivor frame and
importance ranking are ALSO committed as Iceberg tables
(``ckpt_<ns>.round_NNNN_data`` / ``_importances`` via
``writeTo(...).createOrReplace()``): one screening round = one atomic
Iceberg snapshot, replacing the parquet path's state.json rename dance
(SURVEY.md §7.3 hard part 5). Driver state + lineage JSON stay on the
local tree either way — they are metadata-sized and are what ``resume``
reads.
"""

from __future__ import annotations

import json
import os
import time
from typing import Any, Optional

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

__all__ = ["RoundCheckpoint"]


class RoundCheckpoint:
    def __init__(
        self,
        root: str,
        spark: Optional[SparkSession] = None,
        *,
        iceberg_namespace: Optional[str] = None,
    ) -> None:
        self.root = root
        self.spark = spark
        # Iceberg table namespace for round snapshots; defaults to a name
        # derived from the root dir. Only used when the live session has
        # the catalog configured (iceberg_active).
        self.iceberg_namespace = iceberg_namespace or (
            "ckpt_" + os.path.basename(os.path.normpath(root)).replace("-", "_")
        )
        os.makedirs(root, exist_ok=True)
        self._round_times: dict[int, float] = {}
        self._t_last = time.perf_counter()

    # -- paths ---------------------------------------------------------------

    def _round_dir(self, i: int) -> str:
        return os.path.join(self.root, "rounds", f"round={i:04d}")

    @property
    def state_path(self) -> str:
        return os.path.join(self.root, "state.json")

    @property
    def lineage_path(self) -> str:
        return os.path.join(self.root, "_lineage")

    # -- write side (called by screen() after each round) ---------------------

    def save_round(self, i: int, selected, importances) -> None:
        from featurescreening_jl_spark.frame import FeatureFrame

        assert isinstance(selected, FeatureFrame)
        spark = selected.df.sparkSession
        rdir = self._round_dir(i)
        selected.save(os.path.join(rdir, "data"))

        imp_df = spark.createDataFrame(
            [(str(n), int(c)) for n, c in importances],
            "feature string, importance long",
        )
        imp_df.coalesce(1).write.mode("overwrite").parquet(
            os.path.join(rdir, "importances")
        )

        from featurescreening_jl_spark.sources.iceberg import (
            iceberg_active,
            write_table,
        )

        if iceberg_active(spark):
            # one round = one atomic Iceberg snapshot (createOrReplace)
            ns = self.iceberg_namespace
            cols = [selected.id_col, selected.label_col, *selected.names]
            write_table(
                selected.df.select(*cols), f"{ns}.round_{i:04d}_data"
            )
            write_table(imp_df, f"{ns}.round_{i:04d}_importances")

        # per-partition row counts — the lineage/metrics record
        part_counts = (
            selected.df.select(F.spark_partition_id().alias("pid"))
            .groupBy("pid")
            .count()
            .collect()
        )
        n_rows = sum(r["count"] for r in part_counts)
        elapsed = time.perf_counter() - self._t_last
        self._t_last = time.perf_counter()
        lineage_row = {
            "round": i,
            "n_rows": n_rows,
            "n_features": selected.n_features,
            "features": selected.names,
            "partition_rows": {str(r["pid"]): r["count"] for r in part_counts},
            "wall_sec": round(elapsed, 3),
            "ts": time.time(),
        }
        spark.createDataFrame(
            [(i, json.dumps(lineage_row))], "round long, record string"
        ).write.mode("append").parquet(self.lineage_path)

        state = {"round": i, "selected": selected.names}
        tmp = self.state_path + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(state, fh)
        os.replace(tmp, self.state_path)  # atomic: readers never see a torn state

    # -- read side -------------------------------------------------------------

    def load_state(self, root: Optional[str] = None) -> Optional[dict[str, Any]]:
        path = os.path.join(root or self.root, "state.json")
        if not os.path.exists(path):
            return None
        with open(path) as fh:
            return json.load(fh)

    def lineage(self, spark: SparkSession):
        """The lineage table: one JSON record per completed round."""
        return spark.read.parquet(self.lineage_path).orderBy("round")

    def round_frame(self, spark: SparkSession, i: int):
        from featurescreening_jl_spark.frame import FeatureFrame
        from featurescreening_jl_spark.sources.iceberg import iceberg_active

        # Prefer the Iceberg snapshot, but only if this round's table
        # actually exists: a checkpoint written before the catalog was
        # configured (parquet-only rounds) must stay resumable after the
        # Iceberg jar is installed — the parquet round dir is the source
        # of truth for those rounds.
        if iceberg_active(spark):
            table = f"graft.{self.iceberg_namespace}.round_{i:04d}_data"
            try:
                exists = spark.catalog.tableExists(table)
            except Exception:  # unregistered catalog → same as no table
                exists = False
            if exists:
                return FeatureFrame.load(spark, table)
        return FeatureFrame.load(spark, os.path.join(self._round_dir(i), "data"))
