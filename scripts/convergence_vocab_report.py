"""Render the vocab-width convergence sweep (r3 session 9, take 2).

Reads the JSONL logs of the spectral-corpus vocab{16,64,256} runs
(scripts/convergence_spectral_sweep.sh) into one eval-MSE-vs-iteration
plot + a markdown table, mirroring the reference's published
bottleneck-width ordering (reference
outputs/tae_patch16_vocab{16,64,256}_px256/..._log.txt:15 — eval MSE
0.04702 > 0.01717 > 0.00205 at 750k iters on ImageNet).

Pure host-side: safe to run while the chip is busy.

    python scripts/convergence_vocab_report.py \
        --out_png docs/convergence_vocab_sweep.png
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

# Live run dirs first, then the git-committed copies (the sweep script
# snapshots each log into docs/logs/ — untracked .convergence/ does not
# survive rig swaps).
RUNS = {
    v: [
        f"/root/repo/.convergence/out_spec_vocab{v}/conv_log.txt",
        f"/root/repo/docs/logs/spectral_vocab{v}_log.txt",
    ]
    for v in (16, 64, 256)
}

REF_FINAL = {16: 0.04702, 64: 0.01717, 256: 0.00205}  # 750k iters, ImageNet
# optimal linear per-patch coding floors on this corpus
# (scripts/spectral_floor_probe.py, alpha=1.0)
PCA_FLOOR = {16: 0.231, 64: 0.115, 256: 0.020}


def parse_jsonl(paths: list[str]) -> list[tuple[int, float]]:
    # Parse every candidate and keep the one that has progressed furthest
    # (largest final iteration, then row count). A freshly-relaunched live
    # run with 1-2 eval rows must not shadow a complete committed copy.
    best: list[tuple[int, float]] = []
    for path in paths:
        p = Path(path)
        if not p.exists():
            continue
        rows = []
        for line in p.read_text().splitlines():
            line = line.strip()
            if line.startswith("{"):
                try:
                    d = json.loads(line)
                except json.JSONDecodeError:
                    continue  # torn tail line from an in-flight writer
                if "iteration" in d and "eval_loss" in d:
                    rows.append((d["iteration"], d["eval_loss"]))
        if rows and (not best or (rows[-1][0], len(rows)) > (best[-1][0], len(best))):
            best = rows
    return best


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out_png", default="docs/convergence_vocab_sweep.png")
    args = ap.parse_args()

    series: dict[int, list[tuple[int, float]]] = {}
    for vocab, paths in RUNS.items():
        pts = parse_jsonl(paths)
        if pts:
            series[vocab] = pts
        else:
            print(f"NOTE: no eval rows yet for vocab{vocab} ({paths[0]})")

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(7.2, 4.0), dpi=140)
    colors = {16: "#2a78d6", 64: "#eb6834", 256: "#2f9e44"}
    for vocab in sorted(series):
        pts = series[vocab]
        ax.plot([p[0] for p in pts], [p[1] for p in pts],
                color=colors[vocab], lw=2, marker="o", ms=4,
                label=f"vocab{vocab}")
        ax.axhline(PCA_FLOOR[vocab], color=colors[vocab], lw=1, ls="--",
                   alpha=0.55)
    ax.set_yscale("log")
    ax.set_xlabel("iteration")
    ax.set_ylabel("eval MSE (log scale)")
    ax.set_title("bottleneck-width sweep, spectral corpus\n"
                 "(dashed: linear per-patch coding floors)", fontsize=11)
    ax.grid(True, which="both", color="#e6e6e6", lw=0.6)
    ax.set_axisbelow(True)
    for s in ("top", "right"):
        ax.spines[s].set_visible(False)
    for s in ("left", "bottom"):
        ax.spines[s].set_color("#cccccc")
    ax.legend(frameon=False)
    fig.tight_layout()
    fig.savefig(args.out_png)
    print(f"wrote {args.out_png}")

    last_common = min(s[-1][0] for s in series.values()) if series else 0
    print(f"\n| config | ours @ iter {last_common} (spectral) | linear floor "
          "| reference @ 750k (ImageNet) |")
    print("|---|---|---|---|")
    for vocab in sorted(series):
        at = dict(series[vocab])
        ours = at.get(last_common)
        ours_s = f"{ours:.4f}" if ours is not None else "(pending)"
        print(f"| vocab{vocab} | {ours_s} | {PCA_FLOOR[vocab]:.3f} "
              f"| {REF_FINAL[vocab]:.5f} |")


if __name__ == "__main__":
    main()
