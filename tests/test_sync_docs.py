"""Docs gate: claims are pinned to named artifacts (round-11 verdict
item 1).  A pinned claim is validated against exactly the artifact it
names; a newer artifact existing is a staleness WARNING, never a
failure — so the gate is green at ANY committed HEAD, including after
the driver drops the next round's BENCH_r{N}.json."""

import importlib.util
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
spec = importlib.util.spec_from_file_location(
    "sync_docs", os.path.join(REPO, "tools", "sync_docs.py")
)
sync_docs = importlib.util.module_from_spec(spec)
sys.modules["sync_docs"] = sync_docs
spec.loader.exec_module(sync_docs)


def _check_all():
    latest = sync_docs.latest_bench_name()
    n_registry = sync_docs.registry_size()
    errors, warnings = [], []
    for path in sync_docs.doc_files():
        e, w = sync_docs.check(path, n_registry, latest)
        errors.extend(e)
        warnings.extend(w)
    for path in sync_docs._wall_guarded_files():
        e, w = sync_docs.check_query_walls(path, latest)
        errors.extend(e)
        warnings.extend(w)
    return errors, warnings


def test_repo_docs_in_sync():
    """The living docs must be clean at HEAD (rounds 10-11 weak mark)."""
    errors, _ = _check_all()
    assert errors == []


def test_green_after_next_round_artifact_lands():
    """THE round-11 done criterion: dropping a synthetic next-round
    bench artifact with totally different rates must NOT fail the gate
    — pinned claims stay validated against the artifacts they name and
    the new artifact only produces staleness warnings."""
    latest = sync_docs.latest_bench_name()
    n = int(latest.split("_r")[1]) + 1
    synth = os.path.join(REPO, f"BENCH_r{n:02d}.json")
    assert not os.path.exists(synth)
    payload = {
        "parsed": {
            "queries_total": 9999,
            "vcf_parse_variants_per_sec": 42_000_000.0,
            "vcf_parse_full_features_variants_per_sec": 37_000_000.0,
            "vcf_parse_bgzf_single_file_variants_per_sec": 31_000_000.0,
            "vcf_parse_giab_shape_variants_per_sec": 29_000_000.0,
            "queries": {"q_semdedup_keep": 0.001},
        }
    }
    with open(synth, "w") as fh:
        json.dump(payload, fh)
    try:
        errors, warnings = _check_all()
        assert errors == []
        # the old pins are now stale -> warnings, not failures
        assert any(f"BENCH_r{n:02d}" in w for w in warnings)
        # end-to-end: the CLI exits 0 too
        rc = subprocess.run(
            [sys.executable, os.path.join(REPO, "tools", "sync_docs.py")],
            cwd=REPO,
            capture_output=True,
            text=True,
        )
        assert rc.returncode == 0, rc.stdout + rc.stderr
        assert "WARN" in rc.stdout
    finally:
        os.remove(synth)


def _write_artifact(tmp_path, name, parsed, monkeypatch):
    """Point the module's REPO at tmp_path and drop an artifact there."""
    monkeypatch.setattr(sync_docs, "REPO", str(tmp_path))
    with open(tmp_path / f"{name}.json", "w") as fh:
        json.dump({"parsed": parsed}, fh)


PARSED = {
    "queries_total": 169,
    "vcf_parse_variants_per_sec": 1_372_421.1,
    "vcf_parse_bgzf_single_file_variants_per_sec": 907_666.4,
    "queries": {"q_slowest": 2.0},
}


def test_pinned_claim_validated_against_named_artifact(
    tmp_path, monkeypatch
):
    _write_artifact(tmp_path, "BENCH_r05", PARSED, monkeypatch)
    doc = tmp_path / "doc.md"
    doc.write_text(
        "All 169 queries matched that round (BENCH_r05).\n"
        "Scan ran at 1.37M variants/s (BENCH_r05).\n"
        "the reference publishes 106k/s per core.\n"
    )
    errors, warnings = sync_docs.check(str(doc), 181, "BENCH_r05")
    assert errors == []
    assert warnings == []


def test_pinned_lie_fails_unpinned_rate_fails(tmp_path, monkeypatch):
    _write_artifact(tmp_path, "BENCH_r05", PARSED, monkeypatch)
    doc = tmp_path / "doc.md"
    doc.write_text(
        "All 170 queries matched that round (BENCH_r05).\n"  # lie: 169
        "Scan ran at 9.99M variants/s (BENCH_r05).\n"  # lie: 1.37M
        "Steady-state is 1.37M variants/s.\n"  # true but unpinned
    )
    errors, _ = sync_docs.check(str(doc), 181, "BENCH_r05")
    assert len(errors) == 3
    assert any("170" in e for e in errors)
    assert any("9.99M" in e for e in errors)
    assert any("unpinned" in e for e in errors)


def test_stale_pin_warns_not_fails(tmp_path, monkeypatch):
    _write_artifact(tmp_path, "BENCH_r05", PARSED, monkeypatch)
    newer = dict(PARSED, vcf_parse_variants_per_sec=5_000_000.0)
    _write_artifact(tmp_path, "BENCH_r06", newer, monkeypatch)
    doc = tmp_path / "doc.md"
    doc.write_text("Scan ran at 1.37M variants/s (BENCH_r05).\n")
    errors, warnings = sync_docs.check(str(doc), 181, "BENCH_r06")
    assert errors == []
    assert len(warnings) == 1 and "BENCH_r06" in warnings[0]


def test_unpinned_count_checked_against_live_registry(
    tmp_path, monkeypatch
):
    """Counts need no pin: the registry is same-commit code."""
    monkeypatch.setattr(sync_docs, "REPO", str(tmp_path))
    doc = tmp_path / "doc.md"
    doc.write_text("The registry holds 181 oracled queries.\n")
    errors, warnings = sync_docs.check(str(doc), 181, None)
    assert errors == [] and warnings == []
    doc.write_text("The registry holds 169 oracled queries.\n")
    errors, _ = sync_docs.check(str(doc), 181, None)
    assert len(errors) == 1 and "181" in errors[0]


def test_wall_claims(tmp_path, monkeypatch):
    _write_artifact(tmp_path, "BENCH_r05", PARSED, monkeypatch)
    detail = {"queries": {"q_fast": {"warm_sec": 0.5, "cold_sec": 1.4}}}
    with open(tmp_path / "BENCH_DETAIL.json", "w") as fh:
        json.dump(detail, fh)
    doc = tmp_path / "doc.md"
    doc.write_text(
        "q_slowest takes 2.1 s cold (BENCH_r05).\n"  # within 40% of 2.0
        "q_fast warms to 0.5 s (BENCH_DETAIL).\n"
        "q_fast drifted to 9.0 s (BENCH_DETAIL).\n"  # mutable pin: WARN
        "q_slowest regressed to 9.0 s (BENCH_r05).\n"  # snapshot lie: FAIL
        "q_fast sits at 0.5 s today.\n"  # unpinned: FAIL
    )
    errors, warnings = sync_docs.check_query_walls(str(doc), "BENCH_r05")
    assert len(errors) == 2
    assert any("9.0" in e and "BENCH_r05" in e for e in errors)
    assert any("unpinned" in e for e in errors)
    assert len(warnings) == 1 and "BENCH_DETAIL" in warnings[0]


def test_fix_pins_and_rewrites(tmp_path, monkeypatch):
    _write_artifact(tmp_path, "BENCH_r05", PARSED, monkeypatch)
    doc = tmp_path / "doc.md"
    doc.write_text(
        "All 156 queries match.\n"
        "Scan runs at 1.88M variants/s steady-state.\n"
        "BGZF path: 905k/s (BENCH_r05).\n"
        "Pinned overclaim: 9.99M/s (BENCH_r05).\n"
        "the reference publishes 106k/s per core.\n"
    )
    n = sync_docs.fix_file(str(doc), 181, "BENCH_r05")
    assert n == 3
    text = doc.read_text()
    assert "All 181 queries match." in text
    # unpinned stale rate: snapped to nearest artifact rate AND pinned
    assert "1.37M variants/s (BENCH_r05)" in text
    # pinned in-tolerance claim untouched
    assert "905k/s (BENCH_r05)" in text
    # pinned overclaim snapped in place
    assert "1.37M/s (BENCH_r05)" in text and "9.99M" not in text
    assert "106k/s" in text  # reference-baseline line exempt
    errors, _ = sync_docs.check(str(doc), 181, "BENCH_r05")
    assert errors == []


def test_fix_noop_when_clean(tmp_path, monkeypatch):
    _write_artifact(tmp_path, "BENCH_r05", PARSED, monkeypatch)
    doc = tmp_path / "doc.md"
    body = "All 181 queries match at 1.37M variants/s (BENCH_r05).\n"
    doc.write_text(body)
    assert sync_docs.fix_file(str(doc), 181, "BENCH_r05") == 0
    assert doc.read_text() == body


def test_fix_walls_adds_pin(tmp_path):
    doc = tmp_path / "doc.md"
    doc.write_text(
        "q_fast sits at 0.5 s today.\n"
        "q_slow takes 2.1 s cold (BENCH_r05).\n"
    )
    assert sync_docs.fix_walls(str(doc)) == 1
    text = doc.read_text()
    assert "q_fast sits at 0.5 s today. (BENCH_DETAIL)" in text
    assert text.count("BENCH_r05") == 1
