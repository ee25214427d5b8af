"""Render the vocab-width convergence sweep (r3 session 9).

Reads the JSONL logs of the vocab64/vocab256 runs
(scripts/convergence_vocab_sweep.sh) and combines them with the preserved
vocab16 trajectory (docs/CONVERGENCE.md; the raw r3 run dir did not survive
a VM reset) into one eval-MSE-vs-iteration plot + a markdown table,
mirroring the reference's published bottleneck-width ordering
(reference outputs/tae_patch16_vocab{16,64,256}_px256/..._log.txt:15 —
eval MSE 0.04702 > 0.01717 > 0.00205 at 750k iters).

Pure host-side: safe to run while the chip is busy.

    python scripts/convergence_vocab_report.py \
        --out_png docs/convergence_vocab_sweep.png
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

# vocab16 eval trajectory from the r3 5000-iter run (docs/CONVERGENCE.md,
# JSONL schema train_loss/eval_loss/iteration); run dir lost to a VM reset.
VOCAB16 = [
    (500, 0.0521), (1000, 0.0115), (1500, 0.0112),
]

RUNS = {
    64: "/root/repo/.convergence/out_vocab64/conv_log.txt",
    256: "/root/repo/.convergence/out_vocab256/conv_log.txt",
}

REF_FINAL = {16: 0.04702, 64: 0.01717, 256: 0.00205}  # 750k iters, ImageNet


def parse_jsonl(path: str) -> list[tuple[int, float]]:
    rows = []
    p = Path(path)
    if not p.exists():
        return rows
    for line in p.read_text().splitlines():
        line = line.strip()
        if line.startswith("{"):
            d = json.loads(line)
            rows.append((d["iteration"], d["eval_loss"]))
    return rows


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out_png", default="docs/convergence_vocab_sweep.png")
    ap.add_argument("--vocab16_points", default="",
                    help="optional JSONL log to replace the embedded table")
    args = ap.parse_args()

    series: dict[int, list[tuple[int, float]]] = {16: list(VOCAB16)}
    if args.vocab16_points:
        series[16] = parse_jsonl(args.vocab16_points) or series[16]
    for vocab, path in RUNS.items():
        pts = parse_jsonl(path)
        if pts:
            series[vocab] = pts
        else:
            print(f"NOTE: no eval rows yet for vocab{vocab} ({path})")

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(7.2, 4.0), dpi=140)
    colors = {16: "#2a78d6", 64: "#eb6834", 256: "#2f9e44"}
    for vocab in sorted(series):
        pts = [(i, e) for i, e in series[vocab] if i <= 1500]
        ax.plot([p[0] for p in pts], [p[1] for p in pts],
                color=colors[vocab], lw=2, marker="o", ms=4,
                label=f"vocab{vocab}")
    ax.set_yscale("log")
    ax.set_xlabel("iteration")
    ax.set_ylabel("eval MSE (log scale)")
    ax.set_title("tae_patch16_vocab{16,64,256}_px256: bottleneck-width sweep")
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

    # markdown table at the common comparison point (iter 1500)
    print("\n| config | ours @ iter 1500 (synthetic) | reference @ 750k "
          "(ImageNet) |")
    print("|---|---|---|")
    for vocab in sorted(series):
        at = dict(series[vocab])
        ours = at.get(1500)
        ours_s = f"{ours:.4f}" if ours is not None else "(pending)"
        print(f"| vocab{vocab} | {ours_s} | {REF_FINAL[vocab]:.5f} |")


if __name__ == "__main__":
    main()
