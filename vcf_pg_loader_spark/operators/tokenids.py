"""Token-id assignment and the binary training-shard wire format
(round-12 verdict item 2).

The tokenizer loop so far speaks string PIECES; a trainer's dataloader
consumes int32 ids against a frozen piece->id vocabulary plus binary
fixed-width shards it can memory-map.  This module closes that gap:

  - id assignment is a pure function of the train-vocab artifact:
    0 = <pad> (tail-sequence filler in the binary format only),
    1 = <unk> (characters unseen at training time),
    2..  the training alphabet in sorted order (plus the end-of-word
         marker in words mode),
    then every merge product in merge order — dense, stable, and
    reproducible from the artifact alone, the same way sentencepiece /
    GPT-2 vocabularies order base symbols before learned merges.
    A merge product that collides with an earlier piece (possible in
    principle: a merge can re-create the END marker string) keeps the
    EARLIER id (first-wins), so encode is a plain dict lookup.
  - ids attach to a sequence frame as one narrow Arrow pass (the
    vocab is a model-parameter-scale closure constant, like the merge
    table in bpe_encode_arrow) — no shuffle, layout order preserved.
  - the binary format is one file per shard: little-endian int32,
    seq_len tokens per row, sequences in seq_id order, the tail
    sequence padded with <pad> to fixed width; a JSON manifest records
    per-shard byte length, pad count, and an md5 of the exact byte
    stream, so a dataloader (or the export integrity check) can
    verify what it maps before training on it.

Scale shape: the id map ships with the task; the shard files are
written by the tasks that own each shard's rows (repartition on the
shard column — hash partitioning puts ALL of a shard's rows in one
task, several shards may share a task), so the write is as parallel
as the layout.  Only per-shard STATS return to the driver.

Reference parity: the reference ships TSV exports for downstream
tools (gwas/export.py); this is the same terminal-export role for a
training dataloader.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from vcf_pg_loader_spark.operators.bpe import END

PAD_ID = 0
UNK_ID = 1
PAD_PIECE = "<pad>"
UNK_PIECE = "<unk>"


def alphabet_from_counts(wc: DataFrame, mode: str = "words") -> list[str]:
    """The training alphabet from a (w, n) unit-count frame: sorted
    distinct characters, with the END marker appended in words mode
    (it is a real symbol every encoded word ends with).  The collect
    is alphabet-sized — a few hundred rows even for broad Unicode."""
    syms = (
        wc.select(
            F.explode(
                F.filter(F.split(F.col("w"), ""), lambda c: c != "")
            ).alias("s")
        )
        .distinct()
        .collect()
    )
    alpha = sorted(r["s"] for r in syms)
    if mode != "chars":
        alpha.append(END)
    return alpha


def vocab_pieces(
    alphabet: list[str], merges: list[tuple[str, str]]
) -> list[str]:
    """id -> piece, dense: specials, alphabet, merge products."""
    return (
        [PAD_PIECE, UNK_PIECE]
        + list(alphabet)
        + [left + right for left, right in merges]
    )


def piece_ids(
    alphabet: list[str], merges: list[tuple[str, str]]
) -> dict[str, int]:
    """piece -> id, first-wins on (theoretical) collisions."""
    ids: dict[str, int] = {}
    for i, p in enumerate(vocab_pieces(alphabet, merges)):
        ids.setdefault(p, i)
    return ids


def ids_col_arrow(
    df: DataFrame,
    alphabet: list[str],
    merges: list[tuple[str, str]],
    tokens_col: str = "tokens",
    out_col: str = "ids",
) -> DataFrame:
    """Attach `out_col: array<int>` mapping each piece of `tokens_col`
    through the artifact's id assignment (<unk> for unseen pieces).
    One narrow Arrow pass; every input column carries through, so the
    packed per-partition order of a materialized sequence frame is
    preserved."""
    from pyspark.sql.types import ArrayType, IntegerType, StructField, StructType

    idmap = piece_ids(alphabet, merges)
    out_schema = StructType(
        list(df.schema.fields)
        + [StructField(out_col, ArrayType(IntegerType()))]
    )

    def batches(it):
        get = idmap.get
        for pdf in it:
            pdf[out_col] = [
                [get(t, UNK_ID) for t in toks] for toks in pdf[tokens_col]
            ]
            yield pdf

    return df.mapInPandas(batches, schema=out_schema)


def write_id_shards(
    seqs: DataFrame, out_dir: str, seq_len: int, ids_col: str = "ids"
) -> dict:
    """Write (shard, seq_id, ids) as the binary wire format: one
    `shard_{k:05d}.bin` per shard — little-endian int32, seq_len ids
    per row in seq_id order, tail row padded with PAD_ID — plus a
    `manifest.json` with per-shard n_seqs / n_tokens (pre-pad) /
    n_pad / bytes / md5-of-the-byte-stream.  Returns the manifest
    dict.  Each task writes the shards whose rows it owns (atomic
    tmp+rename, so a task retry cannot leave a torn file); only the
    stats rows come back to the driver."""
    import json

    os.makedirs(out_dir, exist_ok=True)
    part = (
        seqs.select("shard", "seq_id", F.col(ids_col).alias("ids"))
        .repartition(F.col("shard"))
        .sortWithinPartitions("shard", "seq_id")
    )
    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
    )

    stats_schema = StructType(
        [
            StructField("shard", LongType()),
            StructField("n_seqs", LongType()),
            StructField("n_tokens", LongType()),
            StructField("n_pad", LongType()),
            StructField("nbytes", LongType()),
            StructField("ids_fp", StringType()),
        ]
    )

    def write_partition(it):
        import hashlib

        import numpy as np
        import pandas as pd

        cur = None  # (shard, fh, tmp_path, md5, counters)
        stats: list[tuple] = []

        def close():
            nonlocal cur
            if cur is None:
                return
            shard, fh, tmp, h, n_seqs, n_tokens, n_pad = cur
            fh.close()
            final = os.path.join(out_dir, f"shard_{shard:05d}.bin")
            os.replace(tmp, final)
            stats.append(
                (
                    shard,
                    n_seqs,
                    n_tokens,
                    n_pad,
                    n_seqs * seq_len * 4,
                    h.hexdigest(),
                )
            )
            cur = None

        for pdf in it:
            for shard, ids in zip(pdf["shard"], pdf["ids"]):
                shard = int(shard)
                if cur is None or cur[0] != shard:
                    close()
                    tmp = os.path.join(
                        out_dir, f".shard_{shard:05d}.bin.tmp{os.getpid()}"
                    )
                    cur = [
                        shard,
                        open(tmp, "wb"),
                        tmp,
                        hashlib.md5(),
                        0,
                        0,
                        0,
                    ]
                n = len(ids)
                row = np.full(seq_len, PAD_ID, dtype="<i4")
                row[:n] = np.asarray(ids, dtype="<i4")
                buf = row.tobytes()
                cur[1].write(buf)
                cur[3].update(buf)
                cur[4] += 1
                cur[5] += n
                cur[6] += seq_len - n
        close()
        yield pd.DataFrame(
            stats,
            columns=[
                "shard",
                "n_seqs",
                "n_tokens",
                "n_pad",
                "nbytes",
                "ids_fp",
            ],
        )

    rows = part.mapInPandas(write_partition, schema=stats_schema).collect()
    # a failed or speculatively-duplicated task leaves .shard_*.tmp{pid}
    # staging files behind (only successful tasks rename); they are
    # invisible to the manifest — sweep them now the job is complete.
    # A late rename racing this sweep would only be re-creating a file
    # an owning task already wrote identically (the bytes are a pure
    # function of the layout), so the sweep cannot lose data.
    for name in os.listdir(out_dir):
        if name.startswith(".shard_") and ".tmp" in name:
            try:
                os.remove(os.path.join(out_dir, name))
            except OSError:
                pass
    manifest = {
        "dtype": "<i4",
        "seq_len": seq_len,
        "pad_id": PAD_ID,
        "shards": {
            str(r["shard"]): {
                "file": f"shard_{r['shard']:05d}.bin",
                "n_seqs": int(r["n_seqs"]),
                "n_tokens": int(r["n_tokens"]),
                "n_pad": int(r["n_pad"]),
                "bytes": int(r["nbytes"]),
                "ids_fp": r["ids_fp"],
            }
            for r in rows
        },
    }
    with open(os.path.join(out_dir, "manifest.json"), "w") as fh:
        json.dump(manifest, fh, sort_keys=True)
    return manifest


def read_id_shard(path: str, seq_len: int):
    """Round-trip reader (tests + integrity): the (n_seqs, seq_len)
    int32 matrix a dataloader memory-maps."""
    import numpy as np

    arr = np.fromfile(path, dtype="<i4")
    return arr.reshape(-1, seq_len)
