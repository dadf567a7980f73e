"""Aggregate the round-4 WGAN-GP-vs-BCE campaign into a markdown table.

Reads docs/data/r4_so_<tag>_<obj>_s<seed>.json (written by
benchmarks/r4_quality_campaign.sh via `compute_fid --second_opinion`)
plus each run dir's best.json, and prints:

* one row per (config, seed, objective) with all five metrics,
* per-seed win/loss verdicts (a win = better on >=4 of 5 metrics;
  3/5 or an even split is reported as a tie), and
* the aggregate verdict line for docs/RESULTS.md.

VERDICT r3 weak #4 / order #8: the round-3 WGAN-GP claim was one seed,
one config; this report is the 3-seed x 2-config replication.

Round 5 (VERDICT r4 order #6): --noise <json> supplies a measured
per-metric eval-noise floor (half-spread across independent 1,024-sample
draws on a fixed model, from `compute_fid --repeats`; see
docs/data/r5_eval_noise.json). A metric whose bce-vs-wgan margin is
inside the floor is INDECISIVE — it counts for neither side — and the
>=4/5 win rule then applies to decisive metrics only, so "never loses"
can no longer ride a coin-flip-sized margin.

Usage: python benchmarks/r4_campaign_report.py [--data docs/data]
           [--runs runs] [--noise docs/data/r5_eval_noise.json]
"""

from __future__ import annotations

import argparse
import json
import os

METRICS = (  # (key path in SO json, lower_is_better)
    ("value", True, "proxy-FID"),
    ("second_opinion.value_b", True, "proxy-FID-b"),
    ("second_opinion.kid_x1000", True, "KIDx1000"),
    ("second_opinion.precision", False, "precision"),
    ("second_opinion.recall", False, "recall"),
)
CONFIGS = {"c64": "64x64 G-LIS-2 (code 128)", "c80": "80x80 G-LIS-3 (code 256)"}


def _get(d, path):
    for part in path.split("."):
        d = d[part]
    return d


def load(data_dir, runs_dir, tag, obj, seed):
    path = os.path.join(data_dir, f"r4_so_{tag}_{obj}_s{seed}.json")
    if not os.path.exists(path):
        return None
    with open(path) as f:
        so = json.load(f)
    row = {label: _get(so, key) for key, _, label in METRICS}
    best = os.path.join(runs_dir, f"r4_{tag}_{obj}_s{seed}", "best.json")
    if os.path.exists(best):
        with open(best) as f:
            row["best_step"] = json.load(f).get("step")
    return row


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--data", default="docs/data")
    p.add_argument("--runs", default="runs")
    p.add_argument(
        "--noise", default="",
        help="JSON of per-metric eval-noise floors (half-spread across "
        "independent draws, keys = metric labels): margins inside the "
        "floor are indecisive",
    )
    args = p.parse_args()

    noise = {}
    if args.noise:
        with open(args.noise) as f:
            noise = json.load(f).get("floors", {})
        print(
            "_Eval-noise floors (half-spread across independent "
            f"{json.load(open(args.noise)).get('num_samples', '?')}-sample "
            "draws): "
            + ", ".join(f"{k} ±{v}" for k, v in noise.items())
            + "; margins inside the floor are indecisive._"
        )

    for tag, desc in CONFIGS.items():
        print(f"\n### {desc}\n")
        print(
            "| seed | objective | best step | proxy-FID | proxy-FID-b |"
            " KIDx1000 | precision | recall | verdict |"
        )
        print("|---|---|---|---|---|---|---|---|---|")
        wins = {"bce": 0, "wgan-gp": 0}
        ties = 0
        complete = 0
        for seed in (1, 2, 3):
            rows = {o: load(args.data, args.runs, tag, o, seed)
                    for o in ("bce", "wgan-gp")}
            if not all(rows.values()):
                for o, r in rows.items():
                    if r is None:
                        print(f"| {seed} | {o} | — | (pending) | | | | | |")
                continue
            complete += 1
            score = {"bce": 0, "wgan-gp": 0}
            indecisive = 0
            for _, lower, label in METRICS:
                a, b = rows["bce"][label], rows["wgan-gp"][label]
                if a == b:
                    continue
                if noise and abs(a - b) <= noise.get(label, 0.0):
                    indecisive += 1  # inside the eval-noise floor
                    continue
                better = ("bce" if a < b else "wgan-gp") if lower else (
                    "bce" if a > b else "wgan-gp")
                score[better] += 1
            # Documented criterion: a seed-level WIN requires >= 4 of the
            # 5 metrics; a 3/5 majority (or an even split) is a tie.
            # With --noise, indecisive metrics count for neither side, so
            # the 4-metric bar must be cleared by DECISIVE margins.
            if score["wgan-gp"] >= 4:
                winner = "wgan-gp"
            elif score["bce"] >= 4:
                winner = "bce"
            else:
                winner = None
            if winner is None:
                ties += 1
            else:
                wins[winner] += 1
            for o in ("bce", "wgan-gp"):
                r = rows[o]
                suffix = f", {indecisive} in noise" if indecisive else ""
                if o != "wgan-gp":
                    v = ""
                elif winner is None:
                    v = (
                        f"tie (wgan-gp {score['wgan-gp']}, "
                        f"bce {score['bce']}{suffix})"
                    )
                else:
                    v = f"**{winner} {score[winner]}/5**{suffix and ' (' + suffix[2:] + ')'}"
                print(
                    f"| {seed} | {o} | {r.get('best_step', '?')} |"
                    f" {r['proxy-FID']:.2f} | {r['proxy-FID-b']:.2f} |"
                    f" {r['KIDx1000']:.1f} | {r['precision']:.3f} |"
                    f" {r['recall']:.3f} | {v} |"
                )
        if complete:
            print(
                f"\nwgan-gp wins {wins['wgan-gp']}/{complete} seeds,"
                f" bce wins {wins['bce']}/{complete},"
                f" {ties} tie(s) (win = >=4/5 metrics) on {desc}."
            )


if __name__ == "__main__":
    main()
