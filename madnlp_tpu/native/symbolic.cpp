// Host-side symbolic analysis for sparse KKT assembly — the C++ runtime
// component of madnlp_tpu (analogue of the reference's symbolic phase,
// /root/reference/src/KKT/Sparse/condensed.jl:201-301 build_condensed_aug_
// symbolic, and src/matrixtools.jl coo_to_csc maps).
//
// Everything here runs once at problem-construction time on the host and
// produces the static index maps that the jitted TPU kernels scatter
// through.  For case9241-scale ACOPF the JᵀDJ pair map has ~10⁷ entries —
// far too slow to build with Python loops, trivial in C++.
//
// Build: g++ -O3 -march=native -shared -fPIC symbolic.cpp -o libsymbolic.so
// Binding: ctypes (madnlp_tpu/native/__init__.py).

#include <cstdint>
#include <vector>
#include <algorithm>

extern "C" {

// Count the JᵀDJ pair-map size: Σ_rows (row_count)².
// rows: COO row index of each Jacobian entry (any order), nnz entries,
// m constraint rows.
int64_t jtdj_pair_count(const int64_t* rows, int64_t nnz, int64_t m) {
    std::vector<int64_t> cnt(m, 0);
    for (int64_t e = 0; e < nnz; ++e) cnt[rows[e]]++;
    int64_t total = 0;
    for (int64_t i = 0; i < m; ++i) total += cnt[i] * cnt[i];
    return total;
}

// Fill the pair map: for every pair (a, b) of entries sharing a row i,
// one record (col[a], col[b], a, b, i).  Output arrays must be
// pre-allocated with jtdj_pair_count() elements.
void jtdj_pair_map(
    const int64_t* rows, const int64_t* cols, int64_t nnz, int64_t m,
    int64_t* pr, int64_t* pc, int64_t* pa, int64_t* pb, int64_t* pk
) {
    // bucket entries by row (counting sort — O(nnz + m))
    std::vector<int64_t> cnt(m + 1, 0);
    for (int64_t e = 0; e < nnz; ++e) cnt[rows[e] + 1]++;
    for (int64_t i = 0; i < m; ++i) cnt[i + 1] += cnt[i];
    std::vector<int64_t> order(nnz);
    std::vector<int64_t> pos(cnt.begin(), cnt.end() - 1);
    for (int64_t e = 0; e < nnz; ++e) order[pos[rows[e]]++] = e;

    int64_t out = 0;
    for (int64_t i = 0; i < m; ++i) {
        const int64_t lo = cnt[i], hi = cnt[i + 1];
        for (int64_t u = lo; u < hi; ++u) {
            const int64_t a = order[u];
            for (int64_t v = lo; v < hi; ++v) {
                const int64_t b = order[v];
                pr[out] = cols[a];
                pc[out] = cols[b];
                pa[out] = a;
                pb[out] = b;
                pk[out] = i;
                ++out;
            }
        }
    }
}

// COO -> CSR-style row grouping (used for segment maps): returns the
// permutation that sorts entries by row (stable) and the row pointer.
void coo_group_rows(
    const int64_t* rows, int64_t nnz, int64_t m,
    int64_t* order, int64_t* rowptr
) {
    std::vector<int64_t> cnt(m + 1, 0);
    for (int64_t e = 0; e < nnz; ++e) cnt[rows[e] + 1]++;
    for (int64_t i = 0; i < m; ++i) cnt[i + 1] += cnt[i];
    for (int64_t i = 0; i <= m; ++i) rowptr[i] = cnt[i];
    std::vector<int64_t> pos(cnt.begin(), cnt.end() - 1);
    for (int64_t e = 0; e < nnz; ++e) order[pos[rows[e]]++] = e;
}

}  // extern "C"
