"""L2/CGI reconstruction lab.

Implements the published FastANI/MashMap L2 stage (sliding minimizer-set
estimator over ``searchIndex`` windows, per Jain et al. 2017/2018 and the
declared API in ``/root/reference/include/fastani/map/compute_map.pxd:30-51``)
with explicit toggles for every detail the on-disk reference under-determines,
then grid-searches the toggle space against the only runnable golden:
the MIBiG protein test (matches must be exactly 130/176 for both references,
``/root/reference/src/pyfastani/tests/test_ani.py:109-115``).

Run:  python tools/l2_lab.py
"""

from __future__ import annotations

import itertools
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

from pyfastani_tpu import stats
from pyfastani_tpu._fasta import Parser
from pyfastani_tpu.models._engine_np import (
    PostingIndex,
    _l1_candidates,
    build_index,
    winnow_sequence,
)
from pyfastani_tpu.models._params import Parameters
from pyfastani_tpu.ops import codec

DATA = "/root/repo/tests/data"


# --------------------------------------------------------------------------
# pipeline pieces
# --------------------------------------------------------------------------


def sketch_protein_refs():
    """Reproduce the golden test setup: BGC0001425 contigs added twice
    (the reference test adds bgc1 under both names)."""
    params = Parameters.from_user(
        k=16,
        fragment_length=100,
        minimum_fraction=0.2,
        p_value=1e-3,
        percentage_identity=80.0,
        reference_size=5_000_000,
        protein=True,
    )
    bgc1 = [r.seq for r in Parser(f"{DATA}/BGC0001425.faa")]

    mh, ms, mw = [], [], []
    counter = 0
    lengths = []
    seq_by_file = []
    for _name in ("BGC0001425", "BGC0001427"):
        total = 0
        for seq in bgc1:
            data = codec.to_bytes(seq)
            slen = int(data.shape[0])
            if slen >= params.window_size and slen >= params.kmer_size:
                h, w = winnow_sequence(data, params)
                mh.append(h)
                ms.append(np.full(h.shape[0], counter, np.int32))
                mw.append(w)
            total += (slen // params.min_read_length) * params.min_read_length
            counter += 1
        lengths.append(total)
        seq_by_file.append(counter)

    index = build_index(
        np.concatenate(mh), np.concatenate(ms), np.concatenate(mw)
    )
    return params, index, np.asarray(seq_by_file, np.int64), lengths


def query_fragments(params):
    recs = [r.seq for r in Parser(f"{DATA}/BGC0001428.faa")]
    l = params.min_read_length
    min_len = min(params.window_size, params.kmer_size, l)
    frags = []
    total_len = 0
    for seq in recs:
        data = codec.to_bytes(seq)
        if data.shape[0] < min_len:
            continue
        slen = int(data.shape[0])
        for i in range(slen // l):
            frags.append(data[i * l : (i + 1) * l])
        total_len += slen
    return frags, total_len


def search_pos(keys, sid, wpos):
    key = np.int64(sid) << 32 | np.int64(np.uint32(np.int64(wpos)))
    return int(np.searchsorted(keys, key, side="left"))


def l2_candidate(
    q_uniq, index, keys, sid, rs, re, cmw, cfg
):
    """Slide super-windows over one L1 candidate; return
    (best_shared, mean_optimal_pos) or None."""
    s = q_uniq.shape[0]
    lo = search_pos(keys, sid, rs)
    hi_last = search_pos(keys, sid, re)
    if cfg["anchors_incl_end"]:
        hi_last = hi_last + 1
    # clamp anchors to this contig
    M = index.mini_hash.shape[0]
    anchors = []
    for t in range(lo, min(hi_last, M)):
        if index.mini_seqid[t] != sid:
            break
        anchors.append(t)
    if not anchors:
        return None

    best = cfg["best_init"]
    shared_out = 0
    begin_opt = 0
    last_opt = 0
    for t in anchors:
        a = int(index.mini_wpos[t])
        end = search_pos(keys, sid, a + cmw)
        wh = np.unique(index.mini_hash[t:end])
        in_q = np.isin(wh, q_uniq, assume_unique=True)
        if cfg["count"] == "containment":
            shared = int(in_q.sum())
        else:
            union = np.union1d(wh, q_uniq)
            tops = union[:s]
            # shared: in top-s of union AND in query AND in window
            shared = int(
                np.isin(tops, wh[in_q], assume_unique=True).sum()
            )
        if shared > best:
            best = shared
            shared_out = shared
            begin_opt = a
            last_opt = a
        elif shared == best:
            last_opt = a
    if shared_out <= 0:
        return None
    return shared_out, (begin_opt + last_opt) // 2


def map_fragment(frag, qid, index, keys, params, cfg, out):
    mh, _ = winnow_sequence(frag, params)
    if mh.shape[0] == 0:
        return
    q_uniq = np.unique(mh)
    s = int(q_uniq.shape[0])
    min_hits = stats.estimate_minimum_hits_relaxed(
        s, params.kmer_size, params.percentage_identity
    )
    iv_seq, iv_start, iv_end = _l1_candidates(q_uniq, index, params, min_hits)
    cmw = params.min_read_length - (params.window_size - 1) - (params.kmer_size - 1)
    for t in range(iv_seq.shape[0]):
        r = l2_candidate(
            q_uniq, index, keys, int(iv_seq[t]), int(iv_start[t]), int(iv_end[t]), cmw, cfg
        )
        if r is None:
            continue
        shared, mean_opt = r
        jaccard = 1.0 * shared / s
        mash = stats.j2md(jaccard, params.kmer_size)
        identity = float(np.float32(100.0 * (1.0 - mash)))
        d_low = stats.md_lower_bound(mash, s, params.kmer_size, stats.CONFIDENCE_INTERVAL)
        identity_ub = float(np.float32(100.0 * (1.0 - d_low)))
        if np.float32(identity_ub) >= np.float32(params.percentage_identity):
            out.append((qid, int(iv_seq[t]), mean_opt, identity, shared, s))


def compute_cgi(mappings, seq_by_file, params, cfg):
    """Exact two-pass CGI (cgi::computeCGI): best per (genome, query frag),
    then unique per (genome, ref contig, ref bin), then f32 mean."""
    if not mappings:
        return []
    l = params.min_read_length
    qseq = np.array([m[0] for m in mappings], np.int64)
    rseq = np.array([m[1] for m in mappings], np.int64)
    rbin = np.array([m[2] // l for m in mappings], np.int64)
    ident = np.array([m[3] for m in mappings], np.float32)
    genome = np.searchsorted(seq_by_file, rseq, side="right")
    order = np.arange(len(mappings))

    # pass 1: best identity per (genome, qseq); tie kept per cfg
    tie1 = order if cfg["pass1_tie"] == "last" else -order
    o1 = np.lexsort((tie1, -ident, qseq, genome))
    first1 = np.ones(o1.shape[0], bool)
    first1[1:] = (genome[o1][1:] != genome[o1][:-1]) | (qseq[o1][1:] != qseq[o1][:-1])
    keep1 = o1[first1]

    # pass 2: unique per (genome, rseq, rbin), best identity first
    tie2 = order[keep1] if cfg["pass2_tie"] == "last" else -order[keep1]
    o2 = np.lexsort((tie2, -ident[keep1], rbin[keep1], rseq[keep1], genome[keep1]))
    k2 = keep1[o2]
    first2 = np.ones(k2.shape[0], bool)
    first2[1:] = (
        (genome[k2][1:] != genome[k2][:-1])
        | (rseq[k2][1:] != rseq[k2][:-1])
        | (rbin[k2][1:] != rbin[k2][:-1])
    )
    keep2 = k2[first2]

    results = []
    g = genome[keep2]
    for gid in np.unique(g):
        sel = ident[keep2][g == gid]
        acc = np.float32(0.0)
        for v in sel:
            acc = np.float32(acc + v)
        results.append((int(gid), int(sel.shape[0]), float(np.float32(acc / np.float32(len(sel))))))
    return results


def run(cfg, params, index, keys, seq_by_file, frags):
    mappings = []
    for i, frag in enumerate(frags):
        map_fragment(frag, i, index, keys, params, cfg, mappings)
    return compute_cgi(mappings, seq_by_file, params, cfg), len(frags)


def main():
    params, index, seq_by_file, lengths = sketch_protein_refs()
    keys = (index.mini_seqid.astype(np.int64) << 32) | index.mini_wpos.astype(np.int64)
    frags, _ = query_fragments(params)
    print(f"index: {index.n_minimizers} minis, {index.n_unique} unique; {len(frags)} fragments")

    grid = {
        "count": ["union", "containment"],
        "anchors_incl_end": [True, False],
        "best_init": [0, 1],
        "pass1_tie": ["first", "last"],
        "pass2_tie": ["first", "last"],
    }
    names = list(grid)
    hits130 = []
    for vals in itertools.product(*grid.values()):
        cfg = dict(zip(names, vals))
        t0 = time.time()
        results, nfrag = run(cfg, params, index, keys, seq_by_file, frags)
        desc = " ".join(f"{k}={v}" for k, v in cfg.items())
        out = [(g, c, round(i, 4)) for g, c, i in results]
        ok = all(c == 130 for _, c, _ in results) and len(results) == 2
        print(f"{'*** ' if ok else '    '}{desc}  ->  {out}  frags={nfrag}  ({time.time()-t0:.1f}s)")
        if ok:
            hits130.append(cfg)
    print("\nconfigs hitting 130/130:", hits130)


if __name__ == "__main__":
    main()
