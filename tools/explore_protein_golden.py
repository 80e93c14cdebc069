"""Scratch harness: grid-search reconstruction variants of the FastANI
L1/L2/CGI semantics against the protein golden (matches=130, fragments=176).

Run: python tools/explore_protein_golden.py
"""

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
cmw = l - (par.window_size - 1) - (par.kmer_size - 1)
sbf = np.asarray(m._sequences_by_file, np.int64)
arrs = [codec.to_bytes(c) for c in bgc3 if len(c) >= 16]


def l1_candidates_raw(q_uniq, merge):
    pos = np.searchsorted(idx.uniq_hash, q_uniq)
    found = pos < idx.n_unique
    posc = np.minimum(pos, max(idx.n_unique - 1, 0))
    found &= idx.uniq_hash[posc] == q_uniq
    rows = posc[found]
    rows = rows[idx.row_len[rows] < idx.freq_threshold]
    if rows.size == 0:
        return []
    lens = idx.row_len[rows].astype(np.int64)
    starts = idx.row_start[rows]
    total = int(lens.sum())
    out_off = np.repeat(np.cumsum(lens) - lens, lens)
    flat = np.arange(total, dtype=np.int64) - out_off + np.repeat(starts, lens)
    hseq = idx.post_seqid[flat]
    hpos = idx.post_wpos[flat]
    order = np.lexsort((hpos, hseq))
    hseq, hpos = hseq[order], hpos[order]
    s = int(q_uniq.shape[0])
    mh = max(
        stats.estimate_minimum_hits_relaxed(s, par.kmer_size, par.percentage_identity),
        1,
    )
    H = hseq.shape[0]
    cands = []
    for j in range(H - mh + 1):
        j2 = j + mh - 1
        if hseq[j2] == hseq[j] and hpos[j2] - hpos[j] < l:
            c = [int(hseq[j]), max(0, int(hpos[j2]) - l + 1), int(hpos[j])]
            if merge and cands and cands[-1][0] == c[0] and cands[-1][2] >= c[1]:
                cands[-1][2] = max(cands[-1][2], c[2])
            else:
                cands.append(c)
    return cands


def l2_eval(q_uniq, sid, c0, c1, anchored, best_init):
    lo = E._search_pos(idx, sid, c0)
    hi = E._search_pos(idx, sid, c1 + cmw)
    rp = idx.mini_wpos[lo:hi]
    sh = E._l2_shared_curve(q_uniq, idx.mini_hash[lo:hi], rp, c0, c1, cmw)
    if anchored:
        anchors = np.unique(rp[(rp >= c0) & (rp <= c1)])
        if anchors.size == 0:
            return None
        vals = sh[anchors - c0]
        poss = anchors
    else:
        vals = sh
        poss = np.arange(c0, c1 + 1)
    best = best_init
    beg = last = 0
    for v, p in zip(vals.tolist(), poss.tolist()):
        if v > best:
            best, beg, last = v, p, p
        elif v == best:
            last = p
    return best, (beg + last) // 2


def run(merge, anchored, best_init, gate_ub, tie1, tie2):
    maps = []  # (qfrag, rseq, rbin, ident)
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
            for sid, c0, c1 in l1_candidates_raw(q, merge):
                r = l2_eval(q, sid, c0, c1, anchored, best_init)
                if r is None:
                    continue
                best, mean = r
                if best <= 0:
                    continue
                jac = 1.0 * best / s
                mash = stats.j2md(jac, par.kmer_size)
                ident = float(np.float32(100.0 * (1.0 - mash)))
                if gate_ub:
                    dl = stats.md_lower_bound(mash, s, par.kmer_size, 0.9)
                    ok = np.float32(100.0 * (1.0 - dl)) >= np.float32(80.0)
                else:
                    ok = np.float32(ident) >= np.float32(80.0)
                if ok:
                    maps.append((qid + i, sid, mean // l, ident))
        qid += nf

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
    if tie1:
        k1 = [i for i in range(len(maps)) if id_[i] == best1[(gen[i], qf[i])]]
        # dedup exact duplicates (same mapping recorded twice via overlap)
        seen = set()
        k1u = []
        for i in k1:
            key = (gen[i], qf[i], rs[i], rb[i])
            if key not in seen:
                seen.add(key)
                k1u.append(i)
        k1 = k1u
    else:
        lastof = {}
        for i in range(len(maps)):
            if id_[i] == best1[(gen[i], qf[i])]:
                lastof[(gen[i], qf[i])] = i
        k1 = sorted(lastof.values())

    best2 = collections.defaultdict(lambda: -1.0)
    for i in k1:
        best2[(rs[i], rb[i])] = max(best2[(rs[i], rb[i])], id_[i])
    if tie2:
        k2 = []
        seen = set()
        for i in k1:
            if id_[i] == best2[(rs[i], rb[i])]:
                key = (rs[i], rb[i], qf[i])
                if key not in seen:
                    seen.add(key)
                    k2.append(i)
    else:
        lastof = {}
        for i in k1:
            if id_[i] == best2[(rs[i], rb[i])]:
                lastof[(rs[i], rb[i])] = i
        k2 = sorted(lastof.values())

    out = {}
    for gid in np.unique(gen[k2]):
        sel = id_[k2][gen[k2] == gid]
        out[int(gid)] = (
            len(sel),
            round(float(np.float32(np.cumsum(sel.astype(np.float32))[-1] / np.float32(len(sel)))), 4),
        )
    return out


if __name__ == "__main__":
    for merge, anchored, init, gate_ub, tie1, tie2 in itertools.product(
        (True, False), (False, True), (0, 1), (True, False), (False, True), (False, True)
    ):
        res = run(merge, anchored, init, gate_ub, tie1, tie2)
        tag = f"merge={merge} anch={anchored} init={init} ub={gate_ub} tie1={tie1} tie2={tie2}"
        print(tag, "->", res)
        if res and res.get(0, (0,))[0] == 130:
            print("^^^ MATCHES GOLDEN")
