#!/usr/bin/env python3
"""Aggregate per-scene results.json into one table + averages
(reference scripts/summary.py:7-54)."""
import glob
import json
import os
from argparse import ArgumentParser

import pandas as pd


def main():
    parser = ArgumentParser()
    parser.add_argument("--root", default=".",
                        help="directory containing <scene>/results.json")
    args = parser.parse_args()

    rows = []
    for path in sorted(glob.glob(os.path.join(args.root, "*", "results.json"))):
        scene = os.path.basename(os.path.dirname(path))
        with open(path) as f:
            res = json.load(f)
        for method, metrics in res.items():
            rows.append({"scene": scene, "method": method, **metrics})
    if not rows:
        print("no results.json found under", args.root)
        return
    df = pd.DataFrame(rows)
    print(df.to_string(index=False))
    numeric = df.select_dtypes("number")
    print("\naverages:")
    print(numeric.mean().to_string())


if __name__ == "__main__":
    main()
