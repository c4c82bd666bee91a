// Native anchor-chain helpers for the segmented aligner.
//
// lis_chain: longest strictly-increasing subsequence of (qpos asc, tpos)
// anchor pairs — the planning hot loop (wfmash_tpu/align/segmented.py::
// _lis_chain is the Python spec; bit-identical selection incl. the
// lexsort tie order). O(n log n) patience sorting.

#include <cstdint>
#include <vector>
#include <algorithm>

extern "C" {

// qpos/tpos: n int64 pairs already LEXSORTED by (qpos, tpos) ascending
// (the caller sorts; ties resolved identically to np.lexsort).
// out: caller-allocated n int64 slots; returns the kept count m with
// out[0..m) = indices into the SORTED arrays forming the chain.
int64_t lis_chain(const int64_t* tpos, int64_t n, int64_t* out) {
    if (n == 0) return 0;
    std::vector<int64_t> tails;       // smallest tail tpos per length
    std::vector<int64_t> tails_idx;
    std::vector<int64_t> parent(n, -1);
    tails.reserve(256); tails_idx.reserve(256);
    for (int64_t i = 0; i < n; i++) {
        int64_t t = tpos[i];
        // bisect_left
        size_t lo = 0, hi = tails.size();
        while (lo < hi) {
            size_t mid = (lo + hi) / 2;
            if (tails[mid] < t) lo = mid + 1; else hi = mid;
        }
        if (lo > 0) parent[i] = tails_idx[lo - 1];
        if (lo == tails.size()) {
            tails.push_back(t);
            tails_idx.push_back(i);
        } else {
            tails[lo] = t;
            tails_idx[lo] = i;
        }
    }
    int64_t m = 0;
    int64_t i = tails_idx.back();
    while (i >= 0) { out[m++] = i; i = parent[i]; }
    // reverse in place
    for (int64_t a = 0, b = m - 1; a < b; a++, b--) {
        int64_t tmp = out[a]; out[a] = out[b]; out[b] = tmp;
    }
    return m;
}

}  // extern "C"
