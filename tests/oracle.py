"""Ground-truth oracle: literal ports of the reference inner loops.

`add_minimizers_oracle` is a direct Python transcription of
``_add_minimizers_nucl`` / ``_add_minimizers_prot``
(``/root/reference/src/pyfastani/_fastani.pyx:156-309``), deque and all,
including the mutable-wpos dedup quirk.  It is O(L) Python and only used
on short test sequences to validate the vectorized implementations.
"""

from collections import deque

import numpy as np

from pyfastani_tpu.ops.codec import complement_table, upper_inplace
from pyfastani_tpu.ops.murmur3 import kmer_hashes

_COMP = complement_table()


def add_minimizers_oracle(seq, k, w, seq_counter, protein=False, minimizer_index=None):
    """Append (hash, seqId, wpos) minimizers for one sequence.

    ``minimizer_index`` is a shared list across contigs (like the C++
    vector); entries are mutable lists [hash, seqId, wpos].

    Hashes come from the vectorized murmur (itself validated against a C
    oracle in test_murmur3.py); what this oracle pins down is the deque /
    dedup / palindrome-skip logic.
    """
    mins = minimizer_index if minimizer_index is not None else []
    data = upper_inplace(np.frombuffer(bytes(seq), dtype=np.uint8))
    n = data.shape[0]
    n_pos = n - k + 1
    with np.errstate(over="ignore"):
        padded = np.concatenate([data, np.zeros(4, np.uint8)])
        fwd_hashes = kmer_hashes(np, padded, k, out_len=max(n_pos, 0))
        rc_all = _COMP[data[::-1]]
        rc_padded = np.concatenate([rc_all, np.zeros(4, np.uint8)])
        rc_hashes = kmer_hashes(np, rc_padded, k, out_len=max(n_pos, 0))
    q = deque()  # items: [hash, seqId, wpos_field, position]
    for i in range(n - k + 1):
        if not protein:
            hash_fwd = int(fwd_hashes[i])
            hash_bwd = int(rc_hashes[n - k - i])
            if hash_bwd == hash_fwd:
                continue  # palindromic k-mers skipped entirely
            current = min(hash_fwd, hash_bwd)
        else:
            current = int(fwd_hashes[i])
        current_window_id = i - w + 1
        while q and q[0][3] <= i - w:
            q.popleft()
        while q and q[-1][0] >= current:
            q.pop()
        q.append([current, seq_counter, 0, i])
        if current_window_id >= 0:
            front = q[0]
            if not mins or mins[-1] != [front[0], front[1], front[2]]:
                front[2] = current_window_id
                mins.append([front[0], front[1], front[2]])
    return mins
