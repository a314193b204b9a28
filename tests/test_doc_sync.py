"""Mechanical doc/data sync enforcement (VERDICT r4 weak-#2: four rounds of
hand-synced benchmark docs, four rounds of drift).

Two mechanisms, both pinned to the committed measurement data
(`BENCH_FULL.json`):

1. The benchmark table in BENCHMARKS.md is GENERATED
   (`tools/gen_benchmarks_md.py`); this test regenerates it and fails on any
   diff, so re-measuring without regenerating the doc fails CI.
2. Numeric claims in prose (README.md, BENCHMARKS.md, docs/*.md) are
   annotated inline with ``<!--bench:METRIC:FIELD[:s]-->`` immediately before
   the number; this test parses every annotation and checks the displayed
   number against the JSON within rounding tolerance. A census asserts the
   headline claims stay annotated (deleting the pin is itself a failure).

No jax import — this is pure-text and runs in milliseconds.
"""

import json
import re
import sys
from pathlib import Path

import pytest

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT / "tools"))

PIN_RE = re.compile(
    r"<!--bench:(?P<metric>[\w.]+):(?P<field>value|vs_baseline)(?P<secs>:s)?-->"
    r"[\s~*]*(?P<num>[0-9]+(?:\.[0-9]+)?)"
)


def _bench():
    return json.loads((ROOT / "BENCH_FULL.json").read_text())


def test_benchmarks_table_not_stale():
    import gen_benchmarks_md as gen

    text = (ROOT / "BENCHMARKS.md").read_text()
    regenerated = gen.regenerate(text, _bench())
    assert text == regenerated, (
        "BENCHMARKS.md generated table is stale vs BENCH_FULL.json — "
        "run: python tools/gen_benchmarks_md.py"
    )


def _iter_pins():
    for path in [ROOT / "README.md", ROOT / "BENCHMARKS.md", *sorted((ROOT / "docs").glob("*.md"))]:
        text = path.read_text()
        for m in PIN_RE.finditer(text):
            yield path.name, m
        # malformed pins (annotation present but no adjacent number) must not
        # silently pass
        for raw in re.finditer(r"<!--bench:[^>]*-->", text):
            if not PIN_RE.match(text, raw.start()):
                raise AssertionError(f"{path.name}: malformed bench pin {raw.group(0)!r}")


def test_prose_claims_match_bench_data():
    by_name = {e["metric"]: e for e in _bench()}
    seen = set()
    checked = 0
    for fname, m in _iter_pins():
        metric, field = m.group("metric"), m.group("field")
        assert metric in by_name, f"{fname}: pin references unknown metric {metric!r}"
        entry = by_name[metric]
        assert field in entry, f"{fname}: {metric} has no field {field!r}"
        actual = float(entry[field])
        if m.group("secs"):
            actual /= 1000.0
        shown = float(m.group("num"))
        # rounding tolerance: half a unit in the last shown decimal place,
        # plus 1% relative for jitter-prone reruns
        decimals = len(m.group("num").split(".")[1]) if "." in m.group("num") else 0
        tol = 0.5 * 10 ** (-decimals) + 0.01 * abs(actual)
        assert abs(shown - actual) <= tol, (
            f"{fname}: claim {shown} for {metric}.{field} drifted from measured {actual:.4g}"
        )
        seen.add((fname, metric, field))
        checked += 1
    assert checked >= 8, f"expected at least 8 bench pins across the docs, found {checked}"

    # census: the headline claims must STAY pinned (removing the annotation
    # would otherwise re-open the drift hole)
    required = [
        ("README.md", "moge2_vitl_infer_latency_518px_bf16_p50", "value"),
        ("README.md", "moge2_vitl_infer_latency_518px_bf16_p50", "vs_baseline"),
        ("README.md", "moge2_vitl_infer_latency_3600tok_bf16_p50", "value"),
        ("README.md", "moge2_vitl_train_step_1369tok_b2_split", "value"),
        ("BENCHMARKS.md", "moge2_vitl_train_step_1369tok_b2_split", "value"),
        ("BENCHMARKS.md", "moge2_vitl_infer_latency_3600tok_bf16_p50", "value"),
        ("split_loss_tpu_fault.md", "moge2_vitl_train_step_1369tok_b2_split", "value"),
        ("train.md", "moge2_vitl_train_step_1369tok_b2_split", "value"),
    ]
    missing = [r for r in required if r not in seen]
    assert not missing, f"required bench pins missing from docs: {missing}"


def test_no_unmarked_stale_solver_numbers():
    """The retired solver step-times (59.3 s, 7.1 s/7118 ms) may appear only
    in clearly-historical narrative: every occurrence must sit on a line that
    also carries a round-tag or history marker."""
    historical = re.compile(r"round-[1-5]|historical|was |until round|retired|round 4|r4", re.I)
    offenders = []
    for path in [ROOT / "README.md", ROOT / "BENCHMARKS.md", *sorted((ROOT / "docs").glob("*.md"))]:
        for i, line in enumerate(path.read_text().splitlines(), 1):
            if re.search(r"7\.1\s*s|7118\s*ms|59\.3\s*s|7\.5\s*s/step", line) and not historical.search(line):
                offenders.append(f"{path.name}:{i}: {line.strip()[:100]}")
    assert not offenders, "stale solver-era numbers outside historical narrative:\n" + "\n".join(offenders)
