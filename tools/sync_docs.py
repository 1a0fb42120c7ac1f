"""Guard the docs against drifting from the driver artifacts.

Round-5 lesson: the changelog quoted an interim local parse rate (1.95M
variants/s) and query count (116) that the authoritative BENCH_r05.json
contradicted (1.32M/s, 117).  This tool makes that drift mechanical to
catch: it loads the LATEST BENCH_r*.json `parsed` contract plus the live
registry, then scans docs/ and README.md for quantitative claims of the
guarded kinds and fails (exit 1) on any number that contradicts the
artifact.

Guarded claims:
  - "N oracled queries" / "N queries" style registry counts: must match
    the live registry size (the registry is the source of truth between
    bench runs; the artifact's queries_total is also accepted for docs
    describing a past round).
  - "X.YZM variants/s" parse-rate claims: must match one of the
    artifact's three parse rates within 10% (minimal / full-featured /
    BGZF single-file) — the tolerance absorbs run-to-run jitter while
    catching the 1.5× overclaim class.
  - per-query wall-time claims ("q_foo ... 1.2 s") in README.md and the
    CURRENT round's docs/ROUND*.md: must be within 40% of the query's
    warm_sec (preferred — cold numbers carry compile-order noise, the
    round-6 lesson) or cold_sec in BENCH_DETAIL.json, or its serve_sec
    under served_paths.  Only single-claim lines are checked (one
    q_name, one "<N> s" token); older ROUND docs describe past rounds
    against past artifacts and are exempt.

Run: python tools/sync_docs.py   (repo root; exits 0 = in sync)
     python tools/sync_docs.py --fix   rewrites every out-of-sync
     registry-count / parse-rate claim in the living docs to the value
     in the LATEST committed artifact (nearest artifact rate, same
     M/k formatting), making the gate structurally un-stale-able: the
     round-close checklist runs `--fix` after the driver's artifacts
     land instead of hand-editing numbers.  Wall-time claims are not
     auto-fixed (they are prose-bound; the checker still flags them).
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def latest_bench() -> dict | None:
    paths = sorted(glob.glob(os.path.join(REPO, "BENCH_r*.json")))
    for path in reversed(paths):
        try:
            with open(path) as fh:
                parsed = json.load(fh).get("parsed")
        except (OSError, ValueError):
            continue
        if parsed:
            parsed["_path"] = os.path.basename(path)
            return parsed
    return None


def bench_detail() -> dict | None:
    try:
        with open(os.path.join(REPO, "BENCH_DETAIL.json")) as fh:
            return json.load(fh)
    except (OSError, ValueError):
        return None


def _query_walls(detail: dict) -> dict[str, list[float]]:
    """Acceptable wall-time references per query: warm first (the number
    docs should cite), then cold, then the served serve_sec."""
    walls: dict[str, list[float]] = {}
    for name, t in (detail.get("queries") or {}).items():
        if isinstance(t, dict):  # round-7+ shape {cold_sec, warm_sec}
            vals = [t.get("warm_sec"), t.get("cold_sec")]
        else:  # pre-round-7 float = cold only
            vals = [t]
        walls[name] = [v for v in vals if v]
    for name, t in (detail.get("served_paths") or {}).items():
        if isinstance(t, dict) and t.get("serve_sec"):
            walls.setdefault(name, []).append(t["serve_sec"])
    return walls


def check_query_walls(path: str, walls: dict[str, list[float]]) -> list[str]:
    errors: list[str] = []
    with open(path) as fh:
        lines = fh.read().splitlines()
    rel = os.path.relpath(path, REPO)
    name_pat = re.compile(r"\bq_[a-z0-9_]+\b")
    sec_pat = re.compile(r"\b(\d+(?:\.\d+)?)\s*s\b")
    for i, line in enumerate(lines, 1):
        names = name_pat.findall(line)
        secs = sec_pat.findall(line)
        if len(set(names)) != 1 or len(secs) != 1:
            continue  # only unambiguous single-claim lines are guarded
        name = names[0]
        if name not in walls or not walls[name]:
            continue
        claim = float(secs[0])
        if not any(abs(claim - w) / w <= 0.40 for w in walls[name]):
            errors.append(
                f"{rel}:{i}: claims {name} at {claim} s; BENCH_DETAIL has "
                + "/".join(f"{w}" for w in walls[name])
                + " (warm/cold/serve)"
            )
    return errors


def registry_size() -> int:
    from vcf_pg_loader_spark.queries import all_queries

    return len(all_queries())


def doc_files() -> list[str]:
    """Living docs only: README + docs/, EXCEPT historical ROUND*.md
    (everything but the newest) — those describe past rounds against
    past artifacts, and rewriting their numbers to the current artifact
    would falsify the record, not sync it."""
    rounds = sorted(
        glob.glob(os.path.join(REPO, "docs", "ROUND*.md")),
        key=lambda p: int(re.search(r"(\d+)", os.path.basename(p)).group(1)),
    )
    historical = set(rounds[:-1])
    return [os.path.join(REPO, "README.md")] + [
        p
        for p in sorted(glob.glob(os.path.join(REPO, "docs", "*.md")))
        if p not in historical
    ]


def _detail_parse_rates(detail: dict | None) -> list[float]:
    """Parse rates from the freshest LOCAL artifact (BENCH_DETAIL.json):
    the per-round BENCH_r*.json lags one round behind the code, so docs
    describing the current round may cite either source."""
    if not detail:
        return []
    rates = []
    for key in ("vcf_parse", "vcf_parse_bgzf", "vcf_parse_giab_shape"):
        block = detail.get(key) or {}
        for k in ("variants_per_sec", "full_features_variants_per_sec"):
            if block.get(k):
                rates.append(block[k])
    return rates


def check(
    path: str,
    bench: dict | None,
    n_registry: int,
    extra_rates: list[float] | None = None,
) -> list[str]:
    errors: list[str] = []
    with open(path) as fh:
        text = fh.read()
    rel = os.path.relpath(path, REPO)

    # registry-count claims: "117 oracled queries", "(117 queries)", ...
    ok_counts = {n_registry}
    if bench and bench.get("queries_total"):
        ok_counts.add(int(bench["queries_total"]))
    for m in re.finditer(r"\b(\d{2,4})\s+(?:oracled\s+)?quer(?:y|ies)", text):
        n = int(m.group(1))
        if n not in ok_counts:
            errors.append(
                f"{rel}: claims {n} queries; registry has {n_registry}"
                + (
                    f", latest artifact {bench['queries_total']}"
                    if bench and bench.get("queries_total")
                    else ""
                )
            )

    # parse-rate claims: "1.32M variants/s", "903k/s", "1,320,841 variants/s"
    if bench:
        rates = [
            bench.get("vcf_parse_variants_per_sec"),
            bench.get("vcf_parse_full_features_variants_per_sec"),
            bench.get("vcf_parse_bgzf_single_file_variants_per_sec"),
            bench.get("vcf_parse_giab_shape_variants_per_sec"),
            *(extra_rates or []),
        ]
        rates = [r for r in rates if r]
        pat = re.compile(
            r"\b(\d+(?:[.,]\d+)*)\s*([MkK])?\s*(?:variants)?/s", re.ASCII
        )
        for m in pat.finditer(text):
            line = text[text.rfind("\n", 0, m.start()) + 1 : m.start()]
            # exempt the reference's published baseline and "≥ target"
            # phrasings — those cite OTHER numbers, not this engine's
            if "reference" in line.lower() or line.rstrip().endswith(
                ("≥", ">=", "~106k", "(≥")
            ) or "≥" in line[-8:]:
                continue
            num = float(m.group(1).replace(",", ""))
            unit = (m.group(2) or "").upper()
            value = num * (1e6 if unit == "M" else 1e3 if unit == "K" else 1)
            if value < 50_000:  # not a parse-rate claim (e.g. "5 rows/s")
                continue
            if not any(abs(value - r) / r <= 0.10 for r in rates):
                errors.append(
                    f"{rel}: parse-rate claim {m.group(0)!r} matches no "
                    f"artifact rate within 10% ({bench['_path']}: "
                    + ", ".join(f"{r:,.0f}" for r in rates)
                    + ")"
                )
    return errors


_RATE_PAT = re.compile(
    r"\b(\d+(?:[.,]\d+)*)\s*([MkK])?\s*(?:variants)?/s", re.ASCII
)


def _rate_exempt(text: str, start: int) -> bool:
    """Same exemptions as check(): reference-baseline and target lines."""
    line = text[text.rfind("\n", 0, start) + 1 : start]
    return (
        "reference" in line.lower()
        or line.rstrip().endswith(("≥", ">=", "~106k", "(≥"))
        or "≥" in line[-8:]
    )


def _fmt_rate(r: float) -> str:
    return f"{r / 1e6:.2f}M" if r >= 1e6 else f"{r / 1e3:.0f}k"


def fix_file(
    path: str,
    bench: dict | None,
    n_registry: int,
    extra_rates: list[float] | None = None,
) -> int:
    """Rewrite stale count/rate claims in-place from the artifact.

    Returns the number of claims rewritten.  Only rewrites claims the
    checker would flag; in-tolerance numbers are left verbatim so diffs
    stay minimal."""
    with open(path) as fh:
        text = fh.read()
    n_fixed = 0

    ok_counts = {n_registry}
    if bench and bench.get("queries_total"):
        ok_counts.add(int(bench["queries_total"]))

    def fix_count(m: re.Match) -> str:
        nonlocal n_fixed
        if int(m.group(1)) in ok_counts:
            return m.group(0)
        n_fixed += 1
        return m.group(0).replace(m.group(1), str(n_registry), 1)

    text = re.sub(
        r"\b(\d{2,4})\s+(?:oracled\s+)?quer(?:y|ies)", fix_count, text
    )

    rates = []
    if bench:
        rates = [
            bench.get("vcf_parse_variants_per_sec"),
            bench.get("vcf_parse_full_features_variants_per_sec"),
            bench.get("vcf_parse_bgzf_single_file_variants_per_sec"),
            bench.get("vcf_parse_giab_shape_variants_per_sec"),
            *(extra_rates or []),
        ]
        rates = [r for r in rates if r]
    if rates:

        def fix_rate(m: re.Match) -> str:
            nonlocal n_fixed
            if _rate_exempt(text, m.start()):
                return m.group(0)
            num = float(m.group(1).replace(",", ""))
            unit = (m.group(2) or "").upper()
            value = num * (1e6 if unit == "M" else 1e3 if unit == "K" else 1)
            if value < 50_000:
                return m.group(0)
            if any(abs(value - r) / r <= 0.10 for r in rates):
                return m.group(0)
            nearest = min(rates, key=lambda r: abs(value - r))
            n_fixed += 1
            old_num = m.group(1) + (m.group(2) or "")
            return m.group(0).replace(old_num, _fmt_rate(nearest), 1)

        text = _RATE_PAT.sub(fix_rate, text)

    if n_fixed:
        with open(path, "w") as fh:
            fh.write(text)
    return n_fixed


def main() -> int:
    fix = "--fix" in sys.argv
    bench = latest_bench()
    n_registry = registry_size()
    detail = bench_detail()
    extra_rates = _detail_parse_rates(detail)
    if fix:
        total = 0
        for path in doc_files():
            n = fix_file(path, bench, n_registry, extra_rates)
            if n:
                print(f"fixed {n} claim(s) in {os.path.relpath(path, REPO)}")
            total += n
        print(f"--fix rewrote {total} claim(s); re-checking...")
    all_errors: list[str] = []
    for path in doc_files():
        all_errors.extend(check(path, bench, n_registry, extra_rates))
    if detail:
        walls = _query_walls(detail)
        rounds = sorted(
            glob.glob(os.path.join(REPO, "docs", "ROUND*.md")),
            key=lambda p: int(re.search(r"(\d+)", os.path.basename(p)).group(1)),
        )
        guarded = [os.path.join(REPO, "README.md")] + rounds[-1:]
        for path in guarded:
            if os.path.exists(path):
                all_errors.extend(check_query_walls(path, walls))
    if all_errors:
        print(f"DOCS OUT OF SYNC ({len(all_errors)}):")
        for e in all_errors:
            print(f"  - {e}")
        return 1
    src = bench["_path"] if bench else "no parsed bench artifact"
    print(
        f"docs in sync: registry={n_registry} queries, artifact={src}, "
        f"{len(doc_files())} files checked"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
