"""Native C++ winnow scanner vs the Python executable spec."""

import numpy as np
import pytest

from wfmash_tpu.native import winnow_minmers_native
from wfmash_tpu.sketch.winnow import winnow_minmers

from util import random_dna


@pytest.mark.parametrize("seed", range(4))
@pytest.mark.parametrize("k,w,s", [(5, 20, 3), (15, 100, 10), (15, 300, 29)])
def test_native_matches_python(seed, k, w, s):
    rng = np.random.default_rng(seed)
    seq = bytearray(random_dna(rng, 1500))
    # sprinkle Ns and lowercase
    seq[40:45] = b"NNNNN"
    seq[300:330] = bytes(seq[300:330]).lower()
    seq = bytes(seq)
    nat = winnow_minmers_native(seq, k, w, s, seq_id=7)
    if nat is None:
        pytest.skip("native library unavailable")
    py = winnow_minmers(seq, k, w, s, seq_id=7)
    assert len(nat) == len(py)
    for f in ("hash", "wpos", "wpos_end", "seq_id", "strand"):
        np.testing.assert_array_equal(nat[f], py[f])
