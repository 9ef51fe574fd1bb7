"""Local stand-in for the driver's correctness gate.

Runs every registered query through Spark AND its DuckDB oracle over
the same parquet tables, then compares row count, column names, and
(order-insensitively) cell values. Strict equality is the target — the
driver hashes values — with a tolerant float comparison reported
separately so a genuine logic bug is distinguishable from a last-ulp
float divergence.

Usage:
    python tools/check_correctness.py [--sf /root/testdata/sf0.01] [--only q01,...]
    python tools/check_correctness.py --changed-since HEAD~3   # touched queries only
"""

from __future__ import annotations

import argparse
import math
import sys
import time
from pathlib import Path

import duckdb
import numpy as np
import pandas as pd

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from big_data_bowl_2026_analytics_spark.core import get_spark  # noqa: E402
from big_data_bowl_2026_analytics_spark.plans import all_queries  # noqa: E402
from big_data_bowl_2026_analytics_spark.sources.readers import TPCH_TABLES  # noqa: E402


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.copy()
    df = df[sorted(df.columns)]
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            df[c] = pd.to_datetime(s).astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(s):
            df[c] = s.astype("float64")
        elif pd.api.types.is_integer_dtype(s):
            df[c] = s.astype("int64")
        elif pd.api.types.is_bool_dtype(s):
            df[c] = s.astype("int64")
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def _numeric_kind(s: pd.Series) -> str | None:
    if pd.api.types.is_bool_dtype(s):
        return None
    if pd.api.types.is_integer_dtype(s):
        return "int"
    if pd.api.types.is_float_dtype(s):
        return "float"
    return None


def _cmp(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame) -> tuple[bool, bool, str]:
    """Returns (strict_match, tolerant_match, detail)."""
    if len(spark_pdf) != len(oracle_pdf):
        return False, False, f"row count {len(spark_pdf)} vs {len(oracle_pdf)}"
    # The driver's value hash is dtype-sensitive: DuckDB sum(int) is
    # HUGEINT -> float64 in pandas while Spark's stays int64. Our
    # normalization would mask that, so flag int-vs-float kind
    # mismatches BEFORE normalizing (fix: CAST(... AS BIGINT) in the
    # oracle). See tools/audit_dtypes.py for the sweep version.
    kind_detail = ""
    for c in set(spark_pdf.columns) & set(oracle_pdf.columns):
        ks, ko = _numeric_kind(spark_pdf[c]), _numeric_kind(oracle_pdf[c])
        if ks and ko and ks != ko:
            kind_detail += f" col {c} dtype-kind: spark={ks} oracle={ko};"
    a, b = _normalize(spark_pdf), _normalize(oracle_pdf)
    if list(a.columns) != list(b.columns):
        return False, False, f"columns {list(a.columns)} vs {list(b.columns)}"
    strict = not kind_detail
    tolerant = True
    detail = kind_detail
    for c in a.columns:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        if pd.api.types.is_float_dtype(a[c]):
            eq = (av == bv) | (np.isnan(av) & np.isnan(bv))
            # == treats -0.0 and +0.0 as equal, but a byte/repr hash
            # (the driver's) does not: DuckDB round() preserves the
            # sign of a negative zero, Spark's drops it. Fix with a
            # `+ 0` after the round on BOTH sides (footgun 9).
            zero_sign = (av == 0) & (bv == 0) & (
                np.signbit(av) != np.signbit(bv)
            )
            if zero_sign.any():
                strict = False
                i = int(np.argmax(zero_sign))
                detail += (
                    f" col {c} sign-of-zero: {av[i]!r} vs {bv[i]!r} @row{i};"
                )
            if not eq.all():
                strict = False
                close = np.isclose(av, bv, rtol=1e-9, atol=1e-9, equal_nan=True)
                if not close.all():
                    tolerant = False
                    i = int(np.argmin(close))
                    detail += f" col {c}: {av[i]!r} vs {bv[i]!r} @row{i};"
                else:
                    i = int(np.argmin(eq))
                    detail += f" col {c} float-ulp: {av[i]!r} vs {bv[i]!r};"
        else:
            eq = pd.Series(av).eq(pd.Series(bv)) | (pd.Series(av).isna() & pd.Series(bv).isna())
            if not eq.all():
                strict = False
                tolerant = False
                i = int(np.argmin(eq.to_numpy()))
                detail += f" col {c}: {av[i]!r} vs {bv[i]!r} @row{i};"
    return strict, tolerant, detail


#: Package files whose change invalidates EVERY query (session build,
#: readers, shared scalar helpers, the registry itself). Matching is
#: by path prefix under the package root.
_GLOBAL_PREFIXES = ("core/", "sources/", "schemas/", "functions/", "plans/registry")

_PKG = "big_data_bowl_2026_analytics_spark"


def names_changed_since(ref: str, specs: dict) -> list[str] | None:
    """Registry names plausibly affected by files changed since ``ref``
    (committed + worktree + untracked). Returns None for "all" when a
    globally-shared file changed — over-selection is safe, silent
    under-selection is the failure mode this exists to prevent (r8
    verdict #8: hand-typed --only lists guessed names wrong).

    Mapping: a changed plans/queries/*.py selects the query names its
    text defines; any other changed package module selects every query
    defined in a plans/queries file that imports its basename — where
    "imports" follows package-internal import edges TRANSITIVELY
    (operators/ivf.py imports operators/similarity.py, so a
    similarity.py change selects ivf-importing queries too; ADVICE
    r9).
    """
    import re
    import subprocess

    def _git(*argv: str) -> list[str]:
        out = subprocess.run(
            ["git", "-C", str(REPO), *argv],
            capture_output=True,
            text=True,
            check=True,
        ).stdout
        return [ln for ln in out.splitlines() if ln.strip()]

    changed = set(_git("diff", "--name-only", ref)) | set(
        _git("ls-files", "--others", "--exclude-standard")
    )
    pkg_changed = [
        p.removeprefix(f"{_PKG}/")
        for p in changed
        if p.startswith(f"{_PKG}/") and p.endswith(".py")
    ]
    if any(p.startswith(_GLOBAL_PREFIXES) for p in pkg_changed):
        return None  # shared infrastructure changed: check everything
    qdir = REPO / _PKG / "plans" / "queries"
    name_pat = re.compile(r'"(q\d+[a-z0-9_]*)"')
    # basenames of changed non-query modules, e.g. "dedup" for
    # operators/dedup.py — matched against query-file import lines
    changed_mods = {
        Path(p).stem
        for p in pkg_changed
        if not p.startswith("plans/queries/")
    }
    if changed_mods:
        # Close over package-internal import edges: a module that
        # imports a changed module is itself "changed" for selection
        # purposes, so queries reached only transitively still get
        # picked up (e.g. ivf -> similarity).
        pkg_root = REPO / _PKG
        dep_edges: dict[str, set[str]] = {}  # basename -> imported basenames
        all_mods = [
            f for f in pkg_root.rglob("*.py")
            if "plans/queries" not in str(f.relative_to(pkg_root))
        ]
        basenames = {f.stem for f in all_mods}
        for f in all_mods:
            imports = [
                ln
                for ln in f.read_text().splitlines()
                if ln.lstrip().startswith(("import ", "from "))
            ]
            deps = {
                m
                for m in basenames
                if m != f.stem
                and any(re.search(rf"\b{re.escape(m)}\b", ln) for ln in imports)
            }
            dep_edges.setdefault(f.stem, set()).update(deps)
        frontier = set(changed_mods)
        while frontier:
            nxt = {
                mod
                for mod, deps in dep_edges.items()
                if deps & changed_mods and mod not in changed_mods
            }
            changed_mods |= nxt
            frontier = nxt
    selected: set[str] = set()
    for qf in sorted(qdir.glob("*.py")):
        text = qf.read_text()
        rel = f"plans/queries/{qf.name}"
        hit = rel in pkg_changed
        if not hit and changed_mods:
            imports = [
                ln
                for ln in text.splitlines()
                if ln.lstrip().startswith(("import ", "from "))
            ]
            hit = any(
                re.search(rf"\b{re.escape(m)}\b", ln)
                for m in changed_mods
                for ln in imports
            )
        if hit:
            selected |= {n for n in name_pat.findall(text) if n in specs}
    return sorted(selected)


#: The output/intermediate-quadratic pair family (both engines pay a
#: pairs-of-rows cost, so the 10x sweep excludes them — their answers
#: are certified at sf0.1 and their candidates-only siblings pass 10x
#: fine). Members verify against all-pairs machinery: q33's
#: language-blocked token-postings self-join (q33/q111/q280/q133/
#: q137), pair-quadratic levenshtein/linkage blocks (q116/q118/q124/
#: q205/q206/q305), or quadratic-answer similarity audits (q324/
#: q346). History: PERF.md rounds 11-12, CLAUDE.md exclusion note.
QUADRATIC_PAIR_FAMILY = (
    "q33_jaccard_similar_pairs",
    "q111_minhash_estimate_error",
    "q116_levenshtein_neardup",
    "q118_sorted_neighborhood_pairs",
    "q124_lsh_blocked_levenshtein",
    "q133_containment_pairs",
    "q137_idf_weighted_jaccard",
    "q205_record_linkage_scores",
    "q206_grid_nearest_neighbor",
    "q280_dedup_threshold_sweep",
    "q305_substitution_screen",
    "q324_link_prediction",
    "q346_neardup_evidence_pairs",
)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--only", default=None)
    ap.add_argument(
        "--changed-since",
        default=None,
        metavar="GIT_REF",
        help="check only registry names mapped from files changed since GIT_REF",
    )
    ap.add_argument(
        "--exclude-quadratic",
        action="store_true",
        help="drop the documented output-quadratic pair family "
        "(the per-round 10x sweep configuration)",
    )
    args = ap.parse_args()

    spark = get_spark("correctness-check")
    con = duckdb.connect()
    for t in TPCH_TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{args.sf}/{t}.parquet')"
        )

    specs = all_queries()
    names = args.only.split(",") if args.only else list(specs)
    if args.exclude_quadratic:
        skip = set(QUADRATIC_PAIR_FAMILY)
        before = len(names)
        names = [n for n in names if n not in skip]
        print(
            f"--exclude-quadratic: dropped {before - len(names)} of the "
            f"{len(QUADRATIC_PAIR_FAMILY)}-member pair family"
        )
    if args.changed_since:
        mapped = names_changed_since(args.changed_since, specs)
        if mapped is None:
            print(f"--changed-since {args.changed_since}: shared file changed; checking all")
        else:
            print(f"--changed-since {args.changed_since}: {len(mapped)} mapped queries")
            names = [n for n in names if n in set(mapped)]
            if not names:
                print("no registry queries map to the change set")
                return 0
    unknown = [n for n in names if n not in specs]
    if unknown:
        print(f"unknown queries: {unknown}; available: {sorted(specs)}")
        return 2
    n_fail = 0
    for name in names:
        spec = specs[name]
        t0 = time.time()
        try:
            sdf = spec.builder(spark, args.sf).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {e}")
            n_fail += 1
            continue
        t_spark = time.time() - t0
        if spec.oracle is None:
            print(f"weak  {name}: rows={len(sdf)} (no oracle) [{t_spark:.1f}s]")
            continue
        try:
            odf = con.execute(spec.oracle).fetchdf()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error: {e}")
            n_fail += 1
            continue
        strict, tolerant, detail = _cmp(sdf, odf)
        if strict:
            print(f"ok    {name}: rows={len(sdf)} strict [{t_spark:.1f}s]")
        elif tolerant:
            print(f"ULP   {name}: rows={len(sdf)} tolerant-only:{detail}")
            n_fail += 1
        else:
            print(f"FAIL  {name}: rows={len(sdf)}:{detail}")
            n_fail += 1
    print(f"\n{len(names) - n_fail}/{len(names)} passing strictly")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
