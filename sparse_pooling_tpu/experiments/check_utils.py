"""Shared helpers for the learning checks' HIGH-RESOLUTION recipe.

Round 4 measured the run-to-run noise of the checks themselves: at 16 val
frames a single seed cannot resolve AP deltas below ~0.06 (seed spread up
to 0.12 easy / 0.06 moderate), while 48 val frames cut the spread to
0.015-0.023. The certified comparison recipe is therefore 48+ held-out
frames x 2+ seeds with mean +/- spread reported — these helpers make that
recipe the DEFAULT output of every check (round-4 verdict item 5).
"""

from __future__ import annotations

from typing import Dict, List, Sequence

BANDS = ("easy", "moderate", "hard")
METRICS = ("2d", "bev", "3d", "aos")


def best_result(results: List[dict], classes: Sequence[str]) -> dict:
    """The checkpoint with the highest mean 3D moderate AP over classes
    (the repo's 'best checkpoint' convention; the reference's
    sweep-all-checkpoints protocol is what produces the candidates)."""

    def score(r):
        return sum(r["ap"][c]["3d"]["moderate"] for c in classes) / len(classes)

    return max(results, key=score)


def aggregate_aps(per_seed_aps: List[Dict], classes: Sequence[str]) -> Dict:
    """per-seed {class: {metric: {band: ap}}} -> {class: {metric: {band:
    {mean, spread, values}}}} where spread is the half-range."""

    agg: Dict = {}
    for cls in classes:
        agg[cls] = {}
        for metric in METRICS:
            if metric not in per_seed_aps[0][cls]:
                continue
            agg[cls][metric] = {}
            for band in BANDS:
                vals = [ap[cls][metric][band] for ap in per_seed_aps]
                agg[cls][metric][band] = {
                    "mean": sum(vals) / len(vals),
                    "spread": (max(vals) - min(vals)) / 2.0,
                    "values": vals,
                }
    return agg


def print_aggregate(
    agg: Dict, classes: Sequence[str], seeds: Sequence[int], label: str
) -> None:
    print(
        f"\n[{label}] mean +/- half-spread over seeds {list(seeds)} "
        "(easy / moderate / hard)"
    )
    for cls in classes:
        for metric in METRICS:
            if metric not in agg[cls]:
                continue
            cells = [
                f"{agg[cls][metric][b]['mean']:.3f}+/-"
                f"{agg[cls][metric][b]['spread']:.3f}"
                for b in BANDS
            ]
            print(f"  {cls:<10} {metric:<4} " + "   ".join(cells))


def parse_seeds(seeds_arg: str, legacy_seed) -> List[int]:
    """--seeds '0,7' (the certified default) with --seed N as the
    explicit single-seed escape hatch for quick probes."""

    if legacy_seed is not None:
        return [int(legacy_seed)]
    return [int(s) for s in str(seeds_arg).split(",") if s != ""]
