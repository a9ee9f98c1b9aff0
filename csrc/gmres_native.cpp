// Native host kernels for gmres_tpu (ctypes ABI).
//
// These are the setup-time, inherently sequential pieces that stay on the
// host in the TPU design (SURVEY.md §7): ILU(0) factorization (the
// reference's ilu0_impl role, kernels_mkl.cpp:416-496 — with diagonal
// positions computed correctly, fixing the reference's unpopulated
// diag_inds defect), triangular dependency-level counts (the analysis
// phase of cusparse csrsv2, kernels_cuda.cpp:27-58), exact sequential
// triangular solves (host verification oracle), and a fast MatrixMarket
// coordinate-line parser (the mmio.c role).
//
// Build: see csrc/Makefile (g++ -O3 -shared -fPIC).

#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <cmath>

extern "C" {

// Sequential IKJ ILU(0) on a CSR pattern with sorted rows and a full
// diagonal.  vals is updated in place (factor values); diag_pos receives
// the index of each row's diagonal entry.  Pivots in rows 1..n-1 with
// magnitude below boost_alpha are clamped to +/-boost_alpha (row 0 is not
// boosted, matching the reference).  Returns 0 on success, -(i+1) if row i
// has no entry with column >= i.
int ilu0_factorize(int64_t n,
                   const int32_t* row_ptr,
                   const int32_t* col_idx,
                   double* vals,
                   int64_t* diag_pos,
                   double boost_alpha) {
    for (int64_t i = 0; i < n; ++i) {
        int64_t lo = row_ptr[i], hi = row_ptr[i + 1];
        // rows are sorted by column: binary search for the first col >= i
        while (lo < hi) {
            int64_t mid = (lo + hi) / 2;
            if (col_idx[mid] < i) lo = mid + 1; else hi = mid;
        }
        if (lo >= row_ptr[i + 1]) return (int)(-(i + 1));
        diag_pos[i] = lo;
    }

    for (int64_t i = 1; i < n; ++i) {
        const int64_t row_start = row_ptr[i];
        const int64_t row_end = row_ptr[i + 1];

        for (int64_t k_ind = row_start; col_idx[k_ind] < i; ++k_ind) {
            const int32_t k = col_idx[k_ind];
            const double factor = vals[k_ind] / vals[diag_pos[k]];
            vals[k_ind] = factor;

            int64_t prev_ind = diag_pos[k] + 1;
            const int64_t prev_end = row_ptr[k + 1];
            int64_t j_ind = k_ind + 1;
            while (j_ind < row_end && prev_ind < prev_end) {
                const int32_t cp = col_idx[prev_ind];
                const int32_t cj = col_idx[j_ind];
                if (cp < cj) {
                    ++prev_ind;
                } else if (cp > cj) {
                    ++j_ind;
                } else {
                    vals[j_ind] -= factor * vals[prev_ind];
                    ++prev_ind;
                    ++j_ind;
                }
            }
        }

        double& dv = vals[diag_pos[i]];
        if (dv >= 0) {
            if (dv < boost_alpha) dv = boost_alpha;
        } else {
            if (dv > -boost_alpha) dv = -boost_alpha;
        }
    }
    return 0;
}

// Dependency-level counts (nilpotency indices) of the strict-lower and
// strict-upper parts.  lev_l/lev_u are scratch of size n; the function
// returns counts via out_l/out_u (= max level + 1).
void tri_level_counts(int64_t n,
                      const int32_t* row_ptr,
                      const int32_t* col_idx,
                      const int64_t* diag_pos,
                      int64_t* lev_l,
                      int64_t* lev_u,
                      int64_t* out_l,
                      int64_t* out_u) {
    int64_t max_l = 0, max_u = 0;
    for (int64_t i = 0; i < n; ++i) {
        int64_t lv = 0;
        for (int64_t j = row_ptr[i]; j < diag_pos[i]; ++j) {
            const int64_t d = lev_l[col_idx[j]];
            if (d + 1 > lv) lv = d + 1;
        }
        lev_l[i] = lv;
        if (lv > max_l) max_l = lv;
    }
    for (int64_t i = n - 1; i >= 0; --i) {
        int64_t lv = 0;
        for (int64_t j = diag_pos[i] + 1; j < row_ptr[i + 1]; ++j) {
            const int64_t d = lev_u[col_idx[j]];
            if (d + 1 > lv) lv = d + 1;
        }
        lev_u[i] = lv;
        if (lv > max_u) max_u = lv;
    }
    *out_l = max_l + 1;
    *out_u = max_u + 1;
}

// Exact sequential triangular solves on the combined ILU factor:
// unit-lower forward substitution, then upper backward substitution
// (the reference's ilusv, kernels_mkl.cpp:355-383).  x is in-out.
void ilu_trisolve(int64_t n,
                  const int32_t* row_ptr,
                  const int32_t* col_idx,
                  const double* vals,
                  const int64_t* diag_pos,
                  double* x) {
    for (int64_t i = 0; i < n; ++i) {
        double sum = x[i];
        for (int64_t j = row_ptr[i]; j < diag_pos[i]; ++j)
            sum -= vals[j] * x[col_idx[j]];
        x[i] = sum;  // unit diagonal
    }
    for (int64_t i = n - 1; i >= 0; --i) {
        double sum = x[i];
        for (int64_t j = diag_pos[i] + 1; j < row_ptr[i + 1]; ++j)
            sum -= vals[j] * x[col_idx[j]];
        x[i] = sum / vals[diag_pos[i]];
    }
}

// Fast MatrixMarket coordinate-line parser: reads nnz whitespace-separated
// (row col [value]) triples from buf.  1-based indices converted to
// 0-based.  pattern != 0 means no value column (values set to 1.0).
// Returns the number of entries parsed (== nnz on success).
int64_t parse_coord(const char* buf,
                    int64_t len,
                    int64_t nnz,
                    int32_t* I,
                    int32_t* J,
                    double* V,
                    int pattern) {
    const char* p = buf;
    const char* end = buf + len;
    int64_t count = 0;
    while (count < nnz && p < end) {
        char* next;
        // skip comment lines
        while (p < end && (*p == '%' || *p == '\n' || *p == '\r')) {
            if (*p == '%') {
                while (p < end && *p != '\n') ++p;
            } else {
                ++p;
            }
        }
        if (p >= end) break;
        long row = strtol(p, &next, 10);
        if (next == p) break;
        p = next;
        long col = strtol(p, &next, 10);
        if (next == p) break;
        p = next;
        double val = 1.0;
        if (!pattern) {
            val = strtod(p, &next);
            if (next == p) break;
            p = next;
        }
        I[count] = (int32_t)(row - 1);
        J[count] = (int32_t)(col - 1);
        V[count] = val;
        ++count;
    }
    return count;
}

}  // extern "C"
