#!/usr/bin/env python3
"""Visualize a fastani_tpu core-genome comparison (.visual file).

Analog of the reference's genoPlotR ribbon plot
(reference: scripts/visualize.R:12-27): draws the query and reference
genomes as two horizontal tracks and one identity-shaded ribbon per
reciprocal fragment mapping from the `.visual` (BLAST outfmt6-like) file.

Usage:
    python scripts/visualize.py <query.fa> <reference.fa> <out.txt.visual>

Output: <out.txt.visual>.pdf
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def read_visual(path):
    """Rows: qname rname identity length mism gap qs qe rs re (outfmt6-like,
    written by fastani_tpu.models.output.write_visual)."""
    rows = []
    with open(path) as f:
        for ln in f:
            p = ln.split()
            if len(p) < 10:
                continue
            rows.append((float(p[2]), int(p[6]), int(p[7]), int(p[8]), int(p[9])))
    return rows


def genome_len(path) -> int:
    from fastani_tpu.io import fasta

    return sum(len(s) for _, s in fasta.read_sequences(path))


def main(argv=None) -> int:
    argv = argv if argv is not None else sys.argv[1:]
    if len(argv) != 3:
        print(__doc__, file=sys.stderr)
        return 2
    query_fa, ref_fa, visual = argv

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from matplotlib.patches import Polygon

    rows = read_visual(visual)
    qlen, rlen = genome_len(query_fa), genome_len(ref_fa)

    fig, ax = plt.subplots(figsize=(10, 4))
    y_q, y_r = 1.0, 0.0
    ax.hlines([y_q, y_r], 0, max(qlen, rlen), color="#444444", lw=3)
    idents = [r[0] for r in rows] or [80.0]
    lo, hi = min(idents), max(100.0, max(idents))
    cmap = plt.get_cmap("RdYlBu_r")
    for ident, qs, qe, rs, re_ in rows:
        t = 0.0 if hi == lo else (ident - lo) / (hi - lo)
        poly = Polygon([(qs, y_q), (qe, y_q), (re_, y_r), (rs, y_r)],
                       closed=True, facecolor=cmap(t), edgecolor="none",
                       alpha=0.65)
        ax.add_patch(poly)
    sm = plt.cm.ScalarMappable(cmap=cmap,
                               norm=plt.Normalize(vmin=lo, vmax=hi))
    fig.colorbar(sm, ax=ax, label="ANI fragment identity (%)", shrink=0.8)
    ax.set_yticks([y_r, y_q])
    ax.set_yticklabels([os.path.basename(ref_fa), os.path.basename(query_fa)])
    ax.set_xlabel("genome position (bp)")
    ax.set_title(f"{os.path.basename(query_fa)} v/s {os.path.basename(ref_fa)}"
                 f"  ({len(rows)} reciprocal mappings)")
    ax.set_xlim(0, max(qlen, rlen))
    ax.set_ylim(-0.3, 1.3)
    fig.tight_layout()
    out = visual + ".pdf"
    fig.savefig(out)
    print(f"wrote {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
