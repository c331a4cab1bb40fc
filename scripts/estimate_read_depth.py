#!/usr/bin/env python
"""Estimate the read depth needed to detect a variant at a given error
probability, using the same Raghavan p-value bound as the pipeline.

Standalone tool equivalent of the reference's
``scrips/estimate_read_depth.py`` (``estimate_read_depth.py:18-50`` reuses
``raghavan_upper_pvalue_bound``): for growing total depth N, compute the
corrected p-value of k supporting reads with uniform per-read error
probability p, and report the smallest k that is significant.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from isocon_tpu.stats.raghavan import raghavan_upper_pvalue_bound


def min_significant_support(depth: int, p_error: float, threshold: float) -> int:
    probability = {"r%d" % i: p_error for i in range(depth)}
    for k in range(1, depth + 1):
        support = ["r%d" % i for i in range(k)]
        p = raghavan_upper_pvalue_bound(probability, support)
        if p < threshold:
            return k
    return -1


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--depths", type=int, nargs="+",
                    default=[10, 20, 50, 100, 200, 500])
    ap.add_argument("--p_error", type=float, default=0.001,
                    help="per-read probability of the identical error")
    ap.add_argument("--p_value_threshold", type=float, default=0.01)
    args = ap.parse_args()

    print("depth\tmin_support_for_significance (p_error=%g, alpha=%g)"
          % (args.p_error, args.p_value_threshold))
    for depth in args.depths:
        k = min_significant_support(depth, args.p_error,
                                    args.p_value_threshold)
        print("%d\t%s" % (depth, k if k > 0 else "not reachable"))


if __name__ == "__main__":
    main()
