#!/usr/bin/env python3
"""Summarize the round-3 hardware campaign artifacts as markdown.

Parses results/round3/<step>.txt (written by round3_hw_campaign.sh),
extracts the headline numbers per step, and prints a BASELINE.md-ready
markdown block.  Steps that have not completed (no CAMPAIGN-STEP-OK
marker) are listed as pending.  Pure stdlib + regex; no device access.
"""
import json
import pathlib
import re
import sys

OUT = pathlib.Path(sys.argv[1] if len(sys.argv) > 1 else "results/round3")


def read(step):
    p = OUT / f"{step}.txt"
    if not p.exists():
        return None, "missing"
    text = p.read_text(errors="replace")
    if "CAMPAIGN-STEP-OK" in text:
        return text, "ok"
    if "CAMPAIGN-STEP-FAILED" in text:
        return text, "FAILED"
    return text, "partial"


def bench_json(text):
    """Last driver-format JSON line in a bench.py log."""
    for line in reversed(text.splitlines()):
        if line.startswith('{"metric"'):
            return json.loads(line)
    return None


def mode_lines(text):
    """bench.py per-mode stderr lines -> {mode: dict(wall, iters, conv)}."""
    out = {}
    for m in re.finditer(
        r"^([\w-]+): converged=(\w+) restarts=(\d+) iters=(\d+) "
        r"wall=([\d.]+)s err=([\deE.+-]+) nnz/s=([\deE.+-]+)",
        text, re.M,
    ):
        out[m.group(1)] = dict(
            conv=m.group(2) == "True", restarts=int(m.group(3)),
            iters=int(m.group(4)), wall=float(m.group(5)),
            nnz_s=float(m.group(7)),
        )
    return out


def kernels_json(text):
    for line in reversed(text.splitlines()):
        if line.startswith("{\"spmv"):
            return json.loads(line)
    return None


def main():
    rows = []

    def row(step, what, fmt):
        text, status = read(step)
        if status != "ok":
            rows.append(f"| `{step}` | {what} | *{status}* |")
            return
        try:
            rows.append(f"| `{step}` | {what} | {fmt(text)} |")
        except Exception as e:  # partial/format drift: show, don't die
            rows.append(f"| `{step}` | {what} | parse error: {e} |")

    def speedup_fmt(text):
        j = bench_json(text)
        modes = mode_lines(text)
        parts = [f"**{j['value']}x** mixed-vs-fp64"] if j else []
        for m, d in modes.items():
            parts.append(f"{m}: {d['wall']:.3f}s/{d['iters']}it"
                         + ("" if d["conv"] else " (NOT CONVERGED)"))
        return "; ".join(parts)

    row("bench_convdiff", "banded (DIA) headline", speedup_fmt)
    row("bench_mesh3d", "unstructured (SELL) headline n=1M", speedup_fmt)
    row("bench_mgs", "MGS headline (multi-row kernel)", speedup_fmt)
    row("bench_ilujacobi", "ILU-Jacobi headline", speedup_fmt)
    row("bench_df64", "df64 tier position", speedup_fmt)
    row("bench_cb", "compressed-basis tier", speedup_fmt)

    def kernels_fmt(text):
        k = kernels_json(text)
        if not k:
            return "no json line"
        parts = []
        for key in sorted(k):
            if key.startswith("spmv") and "nnz_per_s" in k[key]:
                parts.append(f"{key}: {k[key]['nnz_per_s']/1e9:.2f} Gnnz/s")
            if key.startswith("cgsr2"):
                parts.append(f"{key}: {k[key]['gb_per_s']:.0f} GB/s")
        return "; ".join(parts)

    for step in ("kernels_convdiff", "kernels_mesh3d", "kernels_mesh",
                 "sell_g8", "sell_g8d24", "sell_d16"):
        row(step, "kernel bench", kernels_fmt)

    def tail_fmt(text, n=6):
        lines = [ln for ln in text.splitlines()
                 if ln and not ln.startswith("CAMPAIGN")]
        return "<br>".join(lines[-n:])

    row("calibrate_sell", "SELL cost-model refit",
        lambda t: tail_fmt(t, 3))
    row("bench_policy", "policy ms/iter", lambda t: tail_fmt(t, 8))
    row("bench_dist", "distributed ratios", lambda t: tail_fmt(t, 10))
    row("bench_batched", "multi-RHS s=8 n=1M", lambda t: tail_fmt(t, 4))
    row("bench_batched_small", "multi-RHS s=16 n=65K", lambda t: tail_fmt(t, 4))
    row("findmin_identity", "best config (identity)", lambda t: tail_fmt(t, 2))
    row("findmin_ilujacobi", "best config (ilu_jacobi)", lambda t: tail_fmt(t, 2))

    print("### Round-3 hardware campaign summary\n")
    print("| step | measures | result |")
    print("|---|---|---|")
    print("\n".join(rows))


if __name__ == "__main__":
    main()
