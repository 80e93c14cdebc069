"""Round 2: vary L2 window width, eval points, reported position."""

import collections
import itertools
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

from pyfastani_tpu import Sketch, stats
from pyfastani_tpu._fasta import Parser
from pyfastani_tpu.models import _engine_np as E
from pyfastani_tpu.ops import codec

HERE = os.path.dirname(os.path.abspath(__file__))
DATA = os.path.join(HERE, "..", "tests", "data")

bgc1 = [r.seq for r in Parser(os.path.join(DATA, "BGC0001425.faa"))]
bgc3 = [r.seq for r in Parser(os.path.join(DATA, "BGC0001428.faa"))]

sk = Sketch(protein=True, fragment_length=100, backend="numpy")
sk.add_draft("BGC0001425", bgc1)
sk.add_draft("BGC0001427", bgc1)
m = sk.index()
idx, par = m._index, m._param
l = par.min_read_length
cmw0 = l - (par.window_size - 1) - (par.kmer_size - 1)
sbf = np.asarray(m._sequences_by_file, np.int64)
arrs = [codec.to_bytes(c) for c in bgc3 if len(c) >= 16]

# precompute per-fragment sketches and candidate intervals (merged, m>=1)
frags = []
qid = 0
for data in arrs:
    nf = data.shape[0] // l
    for i in range(nf):
        frag = data[i * l : (i + 1) * l]
        mh, _ = E.winnow_sequence(frag, par)
        if mh.shape[0] == 0:
            continue
        q = np.unique(mh)
        s = len(q)
        mhits = stats.estimate_minimum_hits_relaxed(s, par.kmer_size, par.percentage_identity)
        ivs = E._l1_candidates(q, idx, par, mhits)
        frags.append((qid + i, q, s, [(int(ivs[0][t]), int(ivs[1][t]), int(ivs[2][t])) for t in range(ivs[0].shape[0])]))
    qid += nf


def curves(width):
    out = []
    for (qf, q, s, ivlist) in frags:
        for (sid, c0, c1) in ivlist:
            lo = E._search_pos(idx, sid, c0)
            hi = E._search_pos(idx, sid, c1 + width)
            rp = idx.mini_wpos[lo:hi]
            sh = E._l2_shared_curve(q, idx.mini_hash[lo:hi], rp, c0, c1, width)
            anchors = np.unique(rp[(rp >= c0) & (rp <= c1)])
            out.append((qf, s, sid, c0, c1, sh, anchors))
    return out


def evaluate(curv, anchored, posmode):
    maps = []
    for (qf, s, sid, c0, c1, sh, anchors) in curv:
        if anchored:
            if anchors.size == 0:
                continue
            vals = sh[anchors - c0]
            poss = anchors
        else:
            vals = sh
            poss = np.arange(c0, c1 + 1)
        best = 0
        beg = last = 0
        for v, p in zip(vals.tolist(), poss.tolist()):
            if v > best:
                best, beg, last = v, p, p
            elif v == best:
                last = p
        if best <= 0:
            continue
        mean = {"mean": (beg + last) // 2, "beg": beg, "last": last}[posmode]
        jac = 1.0 * best / s
        mash = stats.j2md(jac, par.kmer_size)
        ident = float(np.float32(100.0 * (1.0 - mash)))
        dl = stats.md_lower_bound(mash, s, par.kmer_size, 0.9)
        if np.float32(100.0 * (1.0 - dl)) >= np.float32(80.0):
            maps.append((qf, sid, mean // l, ident))
    if not maps:
        return None
    qf = np.array([x[0] for x in maps])
    rs = np.array([x[1] for x in maps])
    rb = np.array([x[2] for x in maps])
    id_ = np.array([x[3] for x in maps], dtype=np.float32)
    gen = np.searchsorted(sbf, rs, side="right")
    best1 = collections.defaultdict(lambda: -1.0)
    for i in range(len(maps)):
        best1[(gen[i], qf[i])] = max(best1[(gen[i], qf[i])], id_[i])
    k1 = [i for i in range(len(maps)) if id_[i] == best1[(gen[i], qf[i])]]
    best2 = collections.defaultdict(lambda: -1.0)
    for i in k1:
        best2[(rs[i], rb[i])] = max(best2[(rs[i], rb[i])], id_[i])
    seen = set()
    k2 = []
    for i in k1:
        if id_[i] == best2[(rs[i], rb[i])]:
            key = (rs[i], int(rb[i]))
            if key not in seen:
                seen.add(key)
                k2.append(i)
    cnt = collections.Counter(int(gen[i]) for i in k2)
    return dict(cnt)


if __name__ == "__main__":
    for width_d in (0, 1, -1, 2):
        curv = curves(cmw0 + width_d)
        for anchored, posmode in itertools.product((False, True), ("mean", "beg", "last")):
            res = evaluate(curv, anchored, posmode)
            print(f"width=cmw{width_d:+d} anch={anchored} pos={posmode} -> {res}")
            if res and res.get(0) == 130:
                print("^^^ MATCHES GOLDEN")
