#!/usr/bin/env python3
"""Extract the calibration-control medians from a quiet BENCH_DETAIL.json
(run 1 of the pinning protocol) and print the Scala literal block for
Bench.controlRefMedians, plus the agreement math against an optional
second run.

Usage:
  tools/pin_controls.py BENCH_DETAIL.json            # print pins
  tools/pin_controls.py run1.json run2.json          # pins + 5% gate check

The agreement check mirrors the judge's done-criterion for r18 verdict
item #1: with pins taken from run 1, run 1's normalized total is its raw
total (every control ratio is 1.0 by construction) and run 2's is
total_2 / controls_ratio_2; the two must agree within ~5%.
"""
import json
import sys

CONTROLS = ["q_pca_power", "q_pagerank", "ctl_cpu_mix", "ctl_shuffle_agg"]


def load(path):
    with open(path) as f:
        return json.load(f)


def medians(detail):
    out = {}
    qs = detail.get("queries", {})
    ctl = detail.get("controls", {})
    for c in CONTROLS:
        if c in qs:
            out[c] = qs[c]
        elif c in ctl:
            out[c] = ctl[c]["median"]
    return out


def main():
    run1 = load(sys.argv[1])
    assert run1.get("contended") is False, "run 1 is contended — not a pin source"
    m1 = medians(run1)
    missing = [c for c in CONTROLS if c not in m1]
    assert not missing, f"controls missing from run 1: {missing}"
    print("// pinned from quiet run: total=%.2f loadavg=%s git=%s" % (
        run1["value"], run1.get("loadavg_before"), run1.get("git_head", "?")[:12]))
    print('      else (if (sfIsRef) Seq("q_pca_power" -> %.3f, "q_pagerank" -> %.3f)' % (
        m1["q_pca_power"], m1["q_pagerank"]))
    print('            else Nil) ++')
    print('        Seq("ctl_cpu_mix" -> %.3f, "ctl_shuffle_agg" -> %.3f)' % (
        m1["ctl_cpu_mix"], m1["ctl_shuffle_agg"]))

    if len(sys.argv) > 2:
        run2 = load(sys.argv[2])
        m2 = medians(run2)
        ratios = sorted(m2[c] / m1[c] for c in CONTROLS)
        n = len(ratios)
        ratio2 = (ratios[n // 2] if n % 2 else
                  (ratios[n // 2 - 1] + ratios[n // 2]) / 2)
        n1 = run1["value"]
        n2 = run2["value"] / ratio2
        diff = abs(n1 - n2) / n1
        print(f"run1 normalized={n1:.2f}  run2 raw={run2['value']:.2f} "
              f"ratio={ratio2:.3f} normalized={n2:.2f}  diff={diff * 100:.1f}%")
        print("PASS (<=5%)" if diff <= 0.05 else "FAIL (>5%)")


if __name__ == "__main__":
    main()
