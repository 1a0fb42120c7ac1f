"""Round-8 tests: ADVICE fixes (structured-malformed JPEG, sink
unpersist discipline, VectorIndex bare-relative root) plus the round's
new operators (added incrementally below)."""
import os

import numpy as np
import pytest


def _strip_segment(data: bytes, marker: int) -> bytes:
    """Remove every segment with the given marker byte from a JPEG."""
    out = bytearray(data[:2])
    i = 2
    while i < len(data):
        if data[i] != 0xFF:
            out += data[i:]
            break
        m = data[i + 1]
        if m == 0xD9:
            out += data[i:]
            break
        if m == 0x01 or 0xD0 <= m <= 0xD7:
            out += data[i : i + 2]
            i += 2
            continue
        seg_len = int.from_bytes(data[i + 2 : i + 4], "big")
        if m != marker:
            out += data[i : i + 2 + seg_len]
        i += 2 + seg_len
        if m == 0xDA:  # entropy data follows to EOI
            out += data[i:]
            break
    return bytes(out)


def _zero_sof_sampling(data: bytes) -> bytes:
    """Zero the h/v sampling nibbles of the first SOF0 component."""
    out = bytearray(data)
    i = 2
    while i < len(out):
        if out[i] != 0xFF:
            break
        m = out[i + 1]
        seg_len = int.from_bytes(out[i + 2 : i + 4], "big")
        if m in (0xC0, 0xC1):
            out[i + 4 + 7] = 0x00  # first component's hv byte
            return bytes(out)
        i += 2 + seg_len
    raise AssertionError("no SOF found")


class TestStructuredMalformedJpeg:
    """ADVICE #1: structured-malformed shapes (missing DHT/DQT, zero hv
    nibble) must raise ValueError from decode_jpeg — never KeyError or
    ZeroDivisionError — so the multimodal decode seam falls through."""

    def _valid(self):
        from vcf_pg_loader_spark.operators._jpeg import encode_jpeg

        rng = np.random.default_rng(7)
        img = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
        return encode_jpeg(img, "4:4:4")

    def test_missing_dht_raises_valueerror(self):
        from vcf_pg_loader_spark.operators._jpeg import decode_jpeg

        bad = _strip_segment(self._valid(), 0xC4)
        with pytest.raises(ValueError):
            decode_jpeg(bad)

    def test_missing_dqt_raises_valueerror(self):
        from vcf_pg_loader_spark.operators._jpeg import decode_jpeg

        bad = _strip_segment(self._valid(), 0xDB)
        with pytest.raises(ValueError):
            decode_jpeg(bad)

    def test_zero_sampling_factor_raises_valueerror(self):
        from vcf_pg_loader_spark.operators._jpeg import decode_jpeg

        bad = _zero_sof_sampling(self._valid())
        with pytest.raises(ValueError):
            decode_jpeg(bad)

    def test_decode_seam_survives_structured_malformed(self):
        """The multimodal seam must return the deterministic fake (or a
        PIL decode) rather than crash on structured-malformed JPEG."""
        from vcf_pg_loader_spark.operators.multimodal import _decode_image

        bad = _strip_segment(self._valid(), 0xC4)
        out = _decode_image(bad)
        assert out.ndim == 3 and out.shape[2] == 3


class TestVectorIndexRelativeRoot:
    """ADVICE #3: build() must work for a bare relative root ('idx')."""

    def test_bare_relative_root(self, spark, tmp_path, monkeypatch):
        from vcf_pg_loader_spark.sources.vector_index import VectorIndex

        monkeypatch.chdir(tmp_path)
        rng = np.random.default_rng(0)
        rows = [
            (i, [float(x) for x in rng.normal(size=8)]) for i in range(64)
        ]
        vecs = spark.createDataFrame(
            rows, "vec_id int, embedding array<double>"
        )
        idx = VectorIndex(spark, "idx")
        idx.build(vecs, k_centroids=4, m=2, k_sub=4)
        assert os.path.isdir("idx")
        q = spark.createDataFrame(rows[:2], "vec_id int, embedding array<double>")
        hits = idx.search(q, k=3)
        assert hits.count() > 0
