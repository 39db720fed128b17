// Native core of the symbolic plan builder (the framework's
// "graph builder"): the hot index-plan primitives that the host runs
// once per problem structure.  The reference's equivalent layer
// (HYMLS_HierarchicalMap.cpp, HYMLS_MatrixBlock.cpp block extraction,
// FECrsMatrix pattern assembly) is C++; so is this one.
//
// Exposed via a plain C ABI consumed with ctypes (pybind11 is not
// available in this toolchain); every entry point has a numpy
// fallback in core/plan.py.
#include <algorithm>
#include <cstdint>
#include <cstring>

extern "C" {

// Batched sorted lookup: for each query q[i], find its position in the
// ascending array keys[0..n_keys) or return `miss` when absent.
// (CsrLookup.query: the plan builder issues millions of these.)
void lookup_sorted_i64(const int64_t* keys, int64_t n_keys,
                       const int64_t* q, int64_t n_q,
                       int64_t miss, int64_t* out) {
    const int64_t* end = keys + n_keys;
    for (int64_t i = 0; i < n_q; ++i) {
        const int64_t* it = std::lower_bound(keys, end, q[i]);
        out[i] = (it != end && *it == q[i]) ? (it - keys) : miss;
    }
}

// Gather-form inversion of a scatter: for each target t in
// [0, n_targets), collect the (padded) list of source ids s with
// targets[s] == t.  Returns the required width; call once with
// out == nullptr to size the output, then again to fill it
// (row-major (n_targets, width), padded with `sentinel`).
// (_invert_to_padded: TPU scatters serialize, padded gathers do not.)
int64_t invert_to_padded_i64(const int64_t* targets, const int64_t* srcs,
                             int64_t n, int64_t n_targets,
                             int64_t sentinel, int64_t width,
                             int64_t* out) {
    // counting pass
    int64_t* counts = new int64_t[n_targets]();
    for (int64_t i = 0; i < n; ++i) counts[targets[i]] += 1;
    int64_t max_c = 1;
    for (int64_t t = 0; t < n_targets; ++t)
        if (counts[t] > max_c) max_c = counts[t];
    if (out == nullptr) { delete[] counts; return max_c; }

    for (int64_t i = 0, m = n_targets * width; i < m; ++i) out[i] = sentinel;
    std::memset(counts, 0, sizeof(int64_t) * n_targets);
    for (int64_t i = 0; i < n; ++i) {
        int64_t t = targets[i];
        out[t * width + counts[t]] = srcs[i];
        counts[t] += 1;
    }
    delete[] counts;
    return max_c;
}

// Positions of each gid in an ascending array (every gid present);
// the _locate primitive of the plan builder.
void locate_sorted_i64(const int64_t* sorted, int64_t n_sorted,
                       const int64_t* gids, int64_t n_gids,
                       int64_t* out) {
    const int64_t* end = sorted + n_sorted;
    for (int64_t i = 0; i < n_gids; ++i) {
        out[i] = std::lower_bound(sorted, end, gids[i]) - sorted;
    }
}

}  // extern "C"
