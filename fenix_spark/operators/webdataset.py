"""WebDataset-style tar-shard export — the trainer-facing sink for
multimodal corpora (image/audio payload + json metadata per sample,
shards read sequentially by dataloaders).

Format (webdataset convention): each sample is a group of files
sharing a basename — ``<key>.<ext>`` for the payload and
``<key>.json`` for metadata — appended in sample order into
``shard-{n:06d}.tar``.

Scale shape (mirrors ``sampling.write_shards``, the one sanctioned
full-data shuffle):

- shard id = range partition of the deterministic ``hash60(id‖salt)``
  permutation key — same corpus + salt ⇒ byte-identical shards;
- each task writes ITS OWN tar(s) via ``applyInPandas`` over the
  shard id — payload bytes move executor→disk exactly once and never
  visit the driver;
- the return value is a MANIFEST DataFrame (shard path, samples,
  bytes), collect-safe at any corpus size.

Tar entries are written with zeroed mtime/uid/gid so shard bytes are
deterministic, not build-time-stamped.
"""

from __future__ import annotations

import io
import json
import os
import tarfile

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fenix_spark.functions.texthash import hash60


def write_webdataset(
    df: DataFrame,
    path: str,
    id_col: str,
    data_col: str,
    ext_col: str,
    meta_cols: tuple[str, ...] = (),
    shard_rows: int = 1000,
    salt: str = "",
) -> DataFrame:
    """Export (id, binary payload, extension, meta...) rows as
    webdataset tar shards under ``path``; returns the manifest
    (shard, n_samples, n_bytes) DataFrame."""
    os.makedirs(path, exist_ok=True)
    n_rows = df.count()
    n_shards = max(1, -(-n_rows // shard_rows))
    key = hash60(F.concat(F.col(id_col).cast("string"), F.lit(salt)))
    keyed = df.select(
        F.col(id_col).cast("string").alias("__key"),
        F.col(data_col).alias("__data"),
        F.col(ext_col).alias("__ext"),
        *[F.col(c) for c in meta_cols],
        key.alias("__shuffle_key"),
    ).withColumn(
        # contiguous range partition → shard id (ntile over the global
        # order would shuffle twice; a fixed hash-space split keeps one)
        "__shard",
        (
            F.col("__shuffle_key") / F.lit(float(2**60)) * n_shards
        ).cast("int"),
    )

    meta_list = list(meta_cols)

    def write_shard(pdf: pd.DataFrame) -> pd.DataFrame:
        shard = int(pdf["__shard"].iloc[0])
        fname = os.path.join(path, f"shard-{shard:06d}.tar")
        pdf = pdf.sort_values("__shuffle_key", kind="mergesort")
        n_bytes = 0
        metas = [pdf[c].tolist() for c in meta_list]
        with tarfile.open(fname, "w") as tar:
            for idx, (skey, data, ext) in enumerate(
                zip(pdf["__key"], pdf["__data"], pdf["__ext"])
            ):
                blob = bytes(data) if data is not None else b""
                meta = {c: metas[j][idx] for j, c in enumerate(meta_list)}
                for name, payload in (
                    (f"{skey}.{ext}", blob),
                    (
                        f"{skey}.json",
                        json.dumps(meta, sort_keys=True, default=str).encode(),
                    ),
                ):
                    info = tarfile.TarInfo(name)
                    info.size = len(payload)
                    info.mtime = 0  # deterministic shard bytes
                    tar.addfile(info, io.BytesIO(payload))
                    n_bytes += len(payload)
        return pd.DataFrame(
            {"shard": [fname], "n_samples": [len(pdf)], "n_bytes": [n_bytes]}
        )

    manifest = keyed.groupBy("__shard").applyInPandas(
        write_shard, "shard string, n_samples long, n_bytes long"
    )
    # materialize ONCE: the applyInPandas body writes files, so the
    # manifest must not be a lazily re-executable (re-exporting) plan
    rows = manifest.collect()
    return df.sparkSession.createDataFrame(
        rows, "shard string, n_samples long, n_bytes long"
    )

