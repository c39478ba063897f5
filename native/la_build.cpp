// Native LA (linear approximation) table builder.
//
// C++ port of fractalshark_tpu/engine/la_reference.py — which is itself
// the rebuild of the reference's LAReference
// (FractalSharkLib/LAReference.cpp, node algebra
// HpSharkFloatLib/LAInfoDeep.h). The reference builds its LA table on
// the CPU in C++ (CreateLAFromOrbit / CreateLAFromOrbitMT,
// LAReference.cpp:218+); the Python builder in la_reference.py is the
// portable oracle, and this module is the production path: the same
// algorithm at native speed (the Python HD/HDC object walk costs
// ~60 us/orbit entry; this runs ~3 orders of magnitude faster).
//
// Every operation mirrors the Python expression order exactly (HD/HDC
// semantics: double mantissa kept in [1,2) by frexp-reduce, unbounded
// int64 exponent) so the outputs are bit-comparable in differential
// tests.
//
// Build: g++ -O2 -shared -fPIC -o libfs_la.so la_build.cpp

#include <bit>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <thread>
#include <vector>

namespace {

// ------------------------------------------------------------------
// Bit-level frexp/ldexp: the stage-0 walk reduces ~6 HD/HDC values per
// orbit point, and at View #27 scale (period 28.3e9,
// Notes/FractalShark-06-RefOrbit.tex:740-747) the libm calls dominate
// the whole LA build.  Both are BIT-EXACT replacements: the exponent
// split just rewrites the exponent field (normals), and scaling by an
// exactly-representable power of two is correctly rounded exactly as
// ldexp is.  Non-normal edges (subnormal/inf/nan inputs, scales
// outside the normal range) fall back to libm.
// ------------------------------------------------------------------

static constexpr uint64_t kExpMask = 0x7FFULL << 52;

// value*2^e of a normal double split as (mantissa in [1,2), e); the
// caller handles zero.  Returns false on subnormal/inf/nan input.
static inline bool split_norm(double x, double *m, int64_t *e) {
    uint64_t b = std::bit_cast<uint64_t>(x);
    uint64_t ef = (b >> 52) & 0x7FF;
    if (ef == 0 || ef == 0x7FF) return false;
    *e = (int64_t)ef - 1023;
    *m = std::bit_cast<double>((b & ~kExpMask) | (1023ULL << 52));
    return true;
}

// x * 2^k for |k| within the normal scale range (|k| <= 1022: every
// call site's shift is bounded by EXPONENT_DIFF_IGNORED=128 or by a
// normal double's exponent).  Exact: 2^k is representable, and
// multiplying by an exact power of two rounds identically to ldexp.
static inline double mul_pow2(double x, int64_t k) {
    if (k < -1022 || k > 1023) return std::ldexp(x, (int)k);
    return x * std::bit_cast<double>((uint64_t)(k + 1023) << 52);
}

struct HD {
    double m;
    int64_t e;
};

static inline HD hd_zero() { return {0.0, 0}; }

static inline HD hd_reduce(HD a) {
    if (a.m == 0.0) return {0.0, 0};
    double m;
    int64_t ex;
    if (split_norm(a.m, &m, &ex)) return {m, a.e + ex};
    int ei;
    m = std::frexp(a.m, &ei);
    return {m * 2.0, a.e + ei - 1};
}

static inline HD hd_from_double(double x) {
    if (x == 0.0) return {0.0, 0};
    int ex;
    double m = std::frexp(x, &ex);
    return {m * 2.0, (int64_t)ex - 1};
}

static inline HD hd_mul(HD a, HD b) { return hd_reduce({a.m * b.m, a.e + b.e}); }
static inline HD hd_mul_double(HD a, double s) { return hd_reduce({a.m * s, a.e}); }
static inline HD hd_div(HD a, HD b) { return hd_reduce({a.m / b.m, a.e - b.e}); }

static inline bool hd_lt(HD a, HD b) {
    // |a| < |b| for non-negative reduced values (hd values here are
    // produced reduced; mirror HD.lt which re-reduces defensively)
    a = hd_reduce(a);
    b = hd_reduce(b);
    if (a.m == 0.0) return b.m != 0.0;
    if (b.m == 0.0) return false;
    if (a.e != b.e) return a.e < b.e;
    return a.m < b.m;
}

static inline HD hd_min(HD a, HD b) { return hd_lt(a, b) ? a : b; }

struct HDC {
    double re, im;
    int64_t e;
};

static inline HDC hdc_zero() { return {0.0, 0.0, 0}; }

static inline HDC hdc_reduce(HDC a) {
    double big = std::max(std::fabs(a.re), std::fabs(a.im));
    if (big == 0.0) return {0.0, 0.0, 0};
    double m;
    int64_t k;
    if (!split_norm(big, &m, &k)) {
        int ex;
        std::frexp(big, &ex);
        k = (int64_t)ex - 1;
        return {std::ldexp(a.re, (int)-k), std::ldexp(a.im, (int)-k),
                a.e + k};
    }
    return {mul_pow2(a.re, -k), mul_pow2(a.im, -k), a.e + k};
}

static inline HDC hdc_from_complex(double re, double im) {
    return hdc_reduce({re, im, 0});
}

static inline HDC hdc_mul(HDC a, HDC b) {
    // python complex multiply: naive formula
    return hdc_reduce({a.re * b.re - a.im * b.im,
                       a.re * b.im + a.im * b.re, a.e + b.e});
}

static inline HDC hdc_mul_double(HDC a, double s) {
    return hdc_reduce({a.re * s, a.im * s, a.e});
}

static inline HDC hdc_add(HDC a, HDC b) {
    if (a.re == 0.0 && a.im == 0.0) return b;
    if (b.re == 0.0 && b.im == 0.0) return a;
    HDC big = a, small = b;
    if (a.e < b.e) { big = b; small = a; }
    int64_t d = big.e - small.e;
    if (d > 128) return big;
    return hdc_reduce({big.re + mul_pow2(small.re, -d),
                       big.im + mul_pow2(small.im, -d), big.e});
}

static inline HD hdc_cheb(HDC a) {
    return hd_reduce({std::max(std::fabs(a.re), std::fabs(a.im)), a.e});
}

static inline HD hdc_norm_sqr(HDC a) {
    // python: abs(complex)**2 with abs = hypot
    double h = std::hypot(a.re, a.im);
    return hd_reduce({h * h, 2 * a.e});
}

static inline HDC hdc_reciprocal(HDC a) {
    // python: 1.0 / complex — uses Smith's algorithm; mirror via the
    // same guarded formula cpython applies (_Py_c_quot)
    double are = a.re, aim = a.im;
    double r, d, qre, qim;
    if (std::fabs(are) >= std::fabs(aim)) {
        r = aim / are;
        d = are + aim * r;
        qre = 1.0 / d;
        qim = -r / d;
    } else {
        r = are / aim;
        d = are * r + aim;
        qre = r / d;
        qim = -1.0 / d;
    }
    return hdc_reduce({qre, qim, -a.e});
}

struct Params {
    int detection_method;
    double la_threshold_scale;
    double la_threshold_c_scale;
    double stage0_pdt2;  // stage0_period_detection_threshold2
    double pdt2;         // period_detection_threshold2
    double stage0_pdt;
    double pdt;
    int period_divisor;
    // stage-composition stop bound (reference lowBound=64,
    // LAReference.h:56); < 64 composes deeper — down to the terminal
    // 1-node whole-orbit stage — dividing per-orbit-wrap macro-step
    // counts for deep renders (View #27 class).  Clamped to >= 2 at
    // the use site (composition needs a real node pair).
    int64_t low_bound;
};

struct LANode {
    HDC ref, zcoeff, ccoeff;
    HD la_threshold, la_threshold_c, min_mag;
    int64_t step_length = 0;
    int64_t next_stage_la_index = 0;
};

static LANode new_node(const Params &p, HDC z) {
    LANode n;
    n.ref = z;
    n.zcoeff = hdc_from_complex(1.0, 0.0);
    n.ccoeff = hdc_from_complex(1.0, 0.0);
    n.la_threshold = hd_from_double(1.0);
    n.la_threshold_c = hd_from_double(1.0);
    n.min_mag = p.detection_method == 1 ? hd_from_double(4.0) : hd_zero();
    return n;
}

static bool detect_period(const Params &p, const LANode &node, HDC z) {
    if (p.detection_method == 1)
        return hd_lt(hdc_cheb(z), hd_mul_double(node.min_mag, p.pdt2));
    HD lhs = hd_mul_double(hd_div(hdc_cheb(z), hdc_cheb(node.zcoeff)),
                           p.la_threshold_scale);
    return hd_lt(lhs, hd_mul_double(node.la_threshold, p.pdt));
}

// LAInfoDeep::Step (LAInfoDeep.h:187-259)
static LANode step(const Params &p, const LANode &node, HDC z,
                   bool *detected) {
    HD cheb_z = hdc_cheb(z);
    HD out_min = p.detection_method == 1 ? hd_min(cheb_z, node.min_mag)
                                         : node.min_mag;
    HD t1 = hd_mul_double(hd_div(cheb_z, hdc_cheb(node.zcoeff)),
                          p.la_threshold_scale);
    HD t2 = hd_mul_double(hd_div(cheb_z, hdc_cheb(node.ccoeff)),
                          p.la_threshold_c_scale);
    HD out_thr = hd_min(node.la_threshold, t1);
    HD out_thr_c = hd_min(node.la_threshold_c, t2);
    HDC z2 = hdc_mul_double(z, 2.0);
    HDC out_zc = hdc_mul(z2, node.zcoeff);
    HDC out_cc = hdc_add(hdc_mul(z2, node.ccoeff),
                         hdc_from_complex(1.0, 0.0));
    LANode out;
    out.ref = node.ref;
    out.zcoeff = out_zc;
    out.ccoeff = out_cc;
    out.la_threshold = out_thr;
    out.la_threshold_c = out_thr_c;
    out.min_mag = out_min;
    if (p.detection_method == 1)
        *detected = hd_lt(out.min_mag,
                          hd_mul_double(node.min_mag, p.stage0_pdt2));
    else
        *detected = hd_lt(out.la_threshold,
                          hd_mul_double(node.la_threshold, p.stage0_pdt));
    return out;
}

// LAInfoDeep::Composite (LAInfoDeep.h:296-381)
static LANode composite(const Params &p, const LANode &node,
                        const LANode &la, bool *detected) {
    HDC z = la.ref;
    HD cheb_z = hdc_cheb(z);
    HD t1 = hd_mul_double(hd_div(cheb_z, hdc_cheb(node.zcoeff)),
                          p.la_threshold_scale);
    HD t2 = hd_mul_double(hd_div(cheb_z, hdc_cheb(node.ccoeff)),
                          p.la_threshold_c_scale);
    HD out_thr = hd_min(node.la_threshold, t1);
    HD out_thr_c = hd_min(node.la_threshold_c, t2);
    HDC z2 = hdc_mul_double(z, 2.0);
    HDC zc = hdc_mul(z2, node.zcoeff);
    HDC cc = hdc_mul(z2, node.ccoeff);
    t1 = hd_div(la.la_threshold, hdc_cheb(zc));
    t2 = hd_div(la.la_threshold, hdc_cheb(cc));
    HD temp = out_thr;
    out_thr = hd_min(out_thr, t1);
    out_thr_c = hd_min(out_thr_c, t2);
    HDC out_zc = hdc_mul(zc, la.zcoeff);
    HDC out_cc = hdc_add(hdc_mul(cc, la.zcoeff), la.ccoeff);
    HD out_min;
    if (p.detection_method == 1) {
        HD t = hd_min(cheb_z, node.min_mag);
        out_min = hd_min(t, la.min_mag);
        *detected = hd_lt(t, hd_mul_double(node.min_mag, p.pdt2));
    } else {
        out_min = node.min_mag;
        *detected = hd_lt(temp, hd_mul_double(node.la_threshold, p.pdt));
    }
    LANode out;
    out.ref = node.ref;
    out.zcoeff = out_zc;
    out.ccoeff = out_cc;
    out.la_threshold = out_thr;
    out.la_threshold_c = out_thr_c;
    out.min_mag = out_min;
    return out;
}

struct Builder {
    Params p;
    const double *ox = nullptr, *oy = nullptr;
    const int32_t *oe = nullptr;
    // RC (compressed-orbit) source: anchors + the f64 recurrence.
    // gc(i) reconstructs z_i from the last stored anchor <= i,
    // RESETTING at every anchor on the way — exactly the semantics of
    // CompressedOrbit.decompress and of the reference's decompressing
    // orbit accessor the LA build reads through
    // (PerturbationResultsHelpers.h:51-161).  This is what lets LA
    // tables build for orbits that only exist compressed
    // (period-billions View #27 class: the uncompressed orbit would be
    // hundreds of GB).
    const double *ax = nullptr, *ay = nullptr;
    const int64_t *ai = nullptr;
    int64_t n_anchors = 0;
    double rc_cx = 0.0, rc_cy = 0.0;
    int64_t max_ref;
    std::vector<LANode> las;
    std::vector<int64_t> stage_la_index;
    std::vector<int64_t> stage_macro_it_count;
    int64_t stage_count = 0;

    // Hour-scale builds (View #27: 28.3e9 orbit entries on 1 CPU) are
    // opaque without this: FS_LA_PROGRESS=<path> appends one JSON line
    // per ~2^28 consumed orbit entries so node density is observable
    // minutes into the run instead of after it fails.
    FILE *prog = nullptr;
    int64_t prog_next = 0;
    void progress(int64_t i) {
        if (prog && i >= prog_next) {
            fprintf(prog, "{\"i\": %lld, \"nodes\": %lld}\n",
                    (long long)i, (long long)las.size());
            fflush(prog);
            prog_next = i + (int64_t{1} << 28);
        }
    }

    HDC gc(int64_t i) const {
        if (ox) {
            HDC c = hdc_from_complex(ox[i], oy[i]);
            if (oe && (c.re != 0.0 || c.im != 0.0)) c.e += oe[i];
            return c;
        }
        return rc_get(i);
    }

    // per-thread cursor (the MT stage-0 walkers each stream their own
    // segment; the reference keeps a per-thread decompression cache the
    // same way) — sequential access is O(1) amortized, seeks are a
    // binary search + at most one compression span of recurrence steps
    HDC rc_get(int64_t i) const {
        thread_local const void *owner = nullptr;
        thread_local int64_t ci, next_k;
        thread_local double zx, zy;
        auto seek = [&](int64_t target) {
            int64_t lo = 0, hi = n_anchors - 1, k = 0;
            while (lo <= hi) {
                int64_t mid = lo + (hi - lo) / 2;
                if (ai[mid] <= target) { k = mid; lo = mid + 1; }
                else hi = mid - 1;
            }
            ci = ai[k];
            zx = ax[k];
            zy = ay[k];
            next_k = k + 1;
        };
        bool behind = (owner != this) || ci > i;
        if (behind) {
            owner = (const void *)this;
            seek(i);
        } else if (i > ci && next_k < n_anchors && ai[next_k] <= i) {
            // an anchor lies in (ci, i]: jump straight to the last one
            seek(i);
        }
        while (ci < i) {
            double nx = zx * zx - zy * zy + rc_cx;
            zy = 2.0 * zx * zy + rc_cy;
            zx = nx;
            ci++;
        }
        return hdc_from_complex(zx, zy);
    }

    // mirrors _create_la_from_orbit (la_reference.py)
    bool create_la_from_orbit() {
        stage_la_index.assign(1, 0);
        stage_macro_it_count.assign(1, 0);
        stage_count = 0;

        int64_t period = 0;
        LANode la = new_node(p, hdc_zero());
        bool det = false;
        la = step(p, la, gc(1), &det);
        int64_t next_stage_la_index = 0;
        if (la.zcoeff.re == 0.0 && la.zcoeff.im == 0.0) return false;

        int64_t i = 2;
        bool broke = false;
        for (; i < max_ref;) {
            progress(i);
            bool period_detected;
            LANode new_la = step(p, la, gc(i), &period_detected);
            if (!period_detected) {
                la = new_la;
                i += 1;
                continue;
            }
            period = i;
            la.step_length = period;
            la.next_stage_la_index = next_stage_la_index;
            las.push_back(la);
            next_stage_la_index = i;
            if (i + 1 < max_ref) {
                la = step(p, new_node(p, gc(i)), gc(i + 1), &det);
                i += 2;
            } else {
                la = new_node(p, gc(i));
                i += 1;
            }
            broke = true;
            break;
        }
        if (!broke) i = max_ref;

        stage_count = 1;
        int64_t period_begin = period;
        int64_t period_end = period_begin + period;

        const int64_t LOW_BOUND = 64;
        if (period == 0) {
            if (max_ref > LOW_BOUND) {
                la = step(p, new_node(p, gc(0)), gc(1), &det);
                next_stage_la_index = 0;
                i = 2;
                // python round() is half-to-even; llrint under the
                // default FE_TONEAREST mode matches it exactly
                double nth_root_d = std::log2((double)max_ref) /
                                    (double)p.period_divisor;
                int64_t nth_root = llrint(nth_root_d);
                if (nth_root < 1) nth_root = 1;
                double per = std::pow((double)max_ref, 1.0 / (double)nth_root);
                period = llrint(per);
                period_begin = 0;
                period_end = period;
            } else {
                la.step_length = max_ref;
                la.next_stage_la_index = next_stage_la_index;
                las.push_back(la);
                las.push_back(new_node(p, gc(max_ref)));
                stage_macro_it_count[0] = 1;
                return false;
            }
        } else if (period > LOW_BOUND) {
            las.pop_back();
            la = step(p, new_node(p, gc(0)), gc(1), &det);
            next_stage_la_index = 0;
            i = 2;
            double nth_root_d = std::log2((double)max_ref) /
                                (double)p.period_divisor;
            int64_t nth_root = llrint(nth_root_d);
            if (nth_root < 1) nth_root = 1;
            double per = std::pow((double)max_ref, 1.0 / (double)nth_root);
            period = llrint(per);
            period_begin = 0;
            period_end = period;
        }

        for (; i < max_ref;) {
            progress(i);
            bool period_detected;
            LANode new_la = step(p, la, gc(i), &period_detected);
            if (!period_detected && i < period_end) {
                la = new_la;
                i += 1;
                continue;
            }
            la.step_length = i - period_begin;
            la.next_stage_la_index = next_stage_la_index;
            las.push_back(la);
            next_stage_la_index = i;
            period_begin = i;
            period_end = period_begin + period;
            int64_t ip1 = i + 1;
            bool detected2 = detect_period(p, new_la,
                                           gc(std::min(ip1, max_ref)));
            if (detected2 || ip1 >= max_ref) {
                la = new_node(p, gc(i));
                i += 1;
            } else {
                la = step(p, new_node(p, gc(i)), gc(ip1), &det);
                i += 2;
            }
        }

        la.step_length = i - period_begin;
        la.next_stage_la_index = next_stage_la_index;
        las.push_back(la);
        stage_macro_it_count[0] = (int64_t)las.size();
        las.push_back(new_node(p, gc(max_ref)));
        return true;
    }

    // ------------------------------------------------------------------
    // MT stage-0 builder (CreateLAFromOrbitMT, LAReference.cpp:218-520):
    // worker t speculatively SYNCS onto a node boundary near
    // max_ref*t/T by running two phase-offset LA walks until one
    // detects a period (boundaries are self-synchronizing), then every
    // worker builds its segment's nodes independently; segments stitch
    // where a walk's next node start exactly equals a later worker's
    // confirmed boundary (unmatched segments are discarded and covered
    // by the previous walker — output equals the single-thread table).
    struct SyncState {
        bool ok = false;
        int64_t start = -1;     // confirmed node-start boundary
        LANode la;              // post-boundary accumulated node
        int64_t i = -1;         // next orbit index to consume
    };

    SyncState boundary_state(int64_t j, const LANode &closing) {
        SyncState r;
        r.ok = true;
        r.start = j;
        bool det = false;
        int64_t jp1 = j + 1;
        bool detected2 = detect_period(p, closing,
                                       gc(std::min(jp1, max_ref)));
        if (detected2 || jp1 >= max_ref) {
            r.la = new_node(p, gc(j));
            r.i = j + 1;
        } else {
            r.la = step(p, new_node(p, gc(j)), gc(jp1), &det);
            r.i = j + 2;
        }
        return r;
    }

    SyncState sync_from(int64_t begin) {
        SyncState none;
        if (begin < 2 || begin + 2 >= max_ref) return none;
        bool det = false;
        LANode la1 = step(p, new_node(p, gc(begin - 1)), gc(begin), &det);
        int64_t j1 = begin + 1;
        LANode la2 = step(p, new_node(p, gc(begin)), gc(begin + 1), &det);
        int64_t j2 = begin + 2;
        while (j1 < max_ref) {
            bool pd1;
            LANode n1 = step(p, la1, gc(j1), &pd1);
            if (pd1) return boundary_state(j1, n1);
            la1 = n1;
            if (j2 < max_ref) {
                bool pd2;
                LANode n2 = step(p, la2, gc(j2), &pd2);
                if (pd2) return boundary_state(j2, n2);
                la2 = n2;
            }
            j1++;
            j2++;
        }
        return none;
    }

    struct WalkResult {
        std::vector<LANode> nodes;
        LANode la;              // accumulated node at exit
        int64_t i_exit = -1;
        int64_t period_begin = 0;
        int64_t nsli = 0;
        int64_t stitched_to = -1;   // index into starts[] or -1 (end)
    };

    // the ST main loop over [state.i, max_ref) stopping when the next
    // node start equals one of `starts` (ascending candidate list of
    // (boundary, original worker) pairs AFTER this walker's own start)
    WalkResult walk_segment(LANode la, int64_t i, int64_t period,
                            int64_t period_begin, int64_t period_end,
                            int64_t nsli,
                            const std::vector<int64_t> &starts,
                            size_t next_s) const {
        WalkResult r;
        bool det = false;
        for (; i < max_ref;) {
            bool period_detected;
            LANode new_la = step(p, la, gc(i), &period_detected);
            if (!period_detected && i < period_end) {
                la = new_la;
                i += 1;
                continue;
            }
            la.step_length = i - period_begin;
            la.next_stage_la_index = nsli;
            r.nodes.push_back(la);
            nsli = i;
            period_begin = i;
            period_end = period_begin + period;
            while (next_s < starts.size() && starts[next_s] < i)
                next_s++;
            if (next_s < starts.size() && starts[next_s] == i) {
                r.stitched_to = (int64_t)next_s;
                r.i_exit = i;
                r.la = la;
                r.period_begin = period_begin;
                r.nsli = nsli;
                return r;
            }
            int64_t ip1 = i + 1;
            bool detected2 = detect_period(p, new_la,
                                           gc(std::min(ip1, max_ref)));
            if (detected2 || ip1 >= max_ref) {
                la = new_node(p, gc(i));
                i += 1;
            } else {
                la = step(p, new_node(p, gc(i)), gc(ip1), &det);
                i += 2;
            }
        }
        r.la = la;
        r.i_exit = i;
        r.period_begin = period_begin;
        r.nsli = nsli;
        return r;
    }

    // MT variant of create_la_from_orbit: identical output, stage-0
    // walk parallelized.  n_threads <= 1 falls through to the ST path.
    bool create_la_from_orbit_mt(int64_t n_threads) {
        if (n_threads <= 1) return create_la_from_orbit();
        stage_la_index.assign(1, 0);
        stage_macro_it_count.assign(1, 0);
        stage_count = 0;

        // ---- sequential prologue (identical to create_la_from_orbit)
        int64_t period = 0;
        LANode la = new_node(p, hdc_zero());
        bool det = false;
        la = step(p, la, gc(1), &det);
        int64_t next_stage_la_index = 0;
        if (la.zcoeff.re == 0.0 && la.zcoeff.im == 0.0) return false;

        int64_t i = 2;
        bool broke = false;
        for (; i < max_ref;) {
            progress(i);
            bool period_detected;
            LANode new_la = step(p, la, gc(i), &period_detected);
            if (!period_detected) {
                la = new_la;
                i += 1;
                continue;
            }
            period = i;
            la.step_length = period;
            la.next_stage_la_index = next_stage_la_index;
            las.push_back(la);
            next_stage_la_index = i;
            if (i + 1 < max_ref) {
                la = step(p, new_node(p, gc(i)), gc(i + 1), &det);
                i += 2;
            } else {
                la = new_node(p, gc(i));
                i += 1;
            }
            broke = true;
            break;
        }
        if (!broke) i = max_ref;

        stage_count = 1;
        int64_t period_begin = period;
        int64_t period_end = period_begin + period;

        const int64_t LOW_BOUND = 64;
        if (period == 0) {
            if (max_ref > LOW_BOUND) {
                la = step(p, new_node(p, gc(0)), gc(1), &det);
                next_stage_la_index = 0;
                i = 2;
                double nth_root_d = std::log2((double)max_ref) /
                                    (double)p.period_divisor;
                int64_t nth_root = llrint(nth_root_d);
                if (nth_root < 1) nth_root = 1;
                double per = std::pow((double)max_ref,
                                      1.0 / (double)nth_root);
                period = llrint(per);
                period_begin = 0;
                period_end = period;
            } else {
                la.step_length = max_ref;
                la.next_stage_la_index = next_stage_la_index;
                las.push_back(la);
                las.push_back(new_node(p, gc(max_ref)));
                stage_macro_it_count[0] = 1;
                return false;
            }
        } else if (period > LOW_BOUND) {
            las.pop_back();
            la = step(p, new_node(p, gc(0)), gc(1), &det);
            next_stage_la_index = 0;
            i = 2;
            double nth_root_d = std::log2((double)max_ref) /
                                (double)p.period_divisor;
            int64_t nth_root = llrint(nth_root_d);
            if (nth_root < 1) nth_root = 1;
            double per = std::pow((double)max_ref,
                                  1.0 / (double)nth_root);
            period = llrint(per);
            period_begin = 0;
            period_end = period;
        }

        // ---- phase A: workers sync onto boundaries (parallel)
        const int64_t T = n_threads;
        std::vector<SyncState> sync(T);       // [0] unused
        {
            std::vector<std::thread> ths;
            for (int64_t t = 1; t < T; t++) {
                ths.emplace_back([this, &sync, t, T]() {
                    sync[t] = sync_from(max_ref * t / T);
                });
            }
            for (auto &th : ths) th.join();
        }
        // ascending unique boundary list
        std::vector<int64_t> starts;
        std::vector<int64_t> start_worker;
        for (int64_t t = 1; t < T; t++) {
            if (!sync[t].ok) continue;
            if (!starts.empty() && sync[t].start <= starts.back())
                continue;
            if (sync[t].start <= i) continue;   // prologue already past
            starts.push_back(sync[t].start);
            start_worker.push_back(t);
        }

        // ---- phase B: independent segment walks (parallel)
        const size_t S = starts.size();
        std::vector<WalkResult> seg(S + 1);
        {
            std::vector<std::thread> ths;
            for (size_t sdx = 0; sdx < S; sdx++) {
                int64_t t = start_worker[sdx];
                ths.emplace_back([this, &seg, &sync, &starts, sdx, t,
                                  period]() {
                    const SyncState &st = sync[t];
                    seg[sdx + 1] = walk_segment(
                        st.la, st.i, period, st.start,
                        st.start + period, st.start, starts, sdx + 1);
                });
            }
            // worker 0 (this thread): from the prologue state
            seg[0] = walk_segment(la, i, period, period_begin,
                                  period_end, next_stage_la_index,
                                  starts, 0);
            for (auto &th : ths) th.join();
        }

        // ---- merge: follow the stitch chain
        size_t cur = 0;
        const WalkResult *last = nullptr;
        for (;;) {
            const WalkResult &w = seg[cur];
            las.insert(las.end(), w.nodes.begin(), w.nodes.end());
            if (w.stitched_to < 0) {
                last = &w;
                break;
            }
            cur = (size_t)w.stitched_to + 1;   // seg index = starts idx+1
        }

        // ---- epilogue (identical to the ST tail)
        LANode tail = last->la;
        tail.step_length = last->i_exit - last->period_begin;
        tail.next_stage_la_index = last->nsli;
        las.push_back(tail);
        stage_macro_it_count[0] = (int64_t)las.size();
        las.push_back(new_node(p, gc(max_ref)));
        return true;
    }

    // mirrors _create_new_la_stage
    bool create_new_la_stage() {
        const int64_t LOW_BOUND = 64;
        const int64_t MAX_LA_STAGES = 1024;
        int64_t prev_stage = stage_count - 1;
        int64_t cur_stage = stage_count;
        int64_t prev_idx = stage_la_index[prev_stage];
        int64_t prev_count = stage_macro_it_count[prev_stage];
        if (cur_stage >= MAX_LA_STAGES) return false;

        stage_la_index.push_back((int64_t)las.size());
        stage_macro_it_count.push_back(0);

        LANode prev_la = las[prev_idx];
        LANode prev_lap1 = las[prev_idx + 1];

        int64_t period = 0;
        bool det = false;
        LANode la = composite(p, prev_la, prev_lap1, &det);
        int64_t next_stage_la_index = 0;
        int64_t i = prev_la.step_length + prev_lap1.step_length;

        int64_t j = 2;
        for (; j < prev_count;) {
            LANode pj = las[prev_idx + j];
            bool period_detected;
            LANode new_la = composite(p, la, pj, &period_detected);
            if (period_detected) {
                if (pj.la_threshold.m == 0.0) break;
                period = i;
                la.step_length = period;
                la.next_stage_la_index = next_stage_la_index;
                las.push_back(la);
                next_stage_la_index = j;
                LANode pjp1 = las[prev_idx + j + 1];
                if (detect_period(p, new_la, pjp1.ref) ||
                    j + 1 >= prev_count) {
                    la = pj;
                    i += pj.step_length;
                    j += 1;
                } else {
                    la = composite(p, pj, pjp1, &det);
                    i += pj.step_length + pjp1.step_length;
                    j += 2;
                }
                break;
            }
            la = new_la;
            i += pj.step_length;
            j += 1;
        }

        stage_count += 1;
        int64_t period_begin = period;
        int64_t period_end = period_begin + period;

        if (period == 0) {
            if (max_ref > prev_la.step_length * LOW_BOUND) {
                la = composite(p, prev_la, prev_lap1, &det);
                i = prev_la.step_length + prev_lap1.step_length;
                next_stage_la_index = 0;
                j = 2;
                double ratio = (double)max_ref / (double)prev_la.step_length;
                double nth_root_d = std::log2((double)max_ref) /
                                    (double)p.period_divisor;
                int64_t nth_root = llrint(nth_root_d);
                if (nth_root < 1) nth_root = 1;
                period = prev_la.step_length *
                         llrint(std::pow(ratio, 1.0 / (double)nth_root));
                period_begin = 0;
                period_end = period;
            } else {
                la.step_length = max_ref;
                la.next_stage_la_index = next_stage_la_index;
                las.push_back(la);
                las.push_back(new_node(p, gc(max_ref)));
                stage_macro_it_count[cur_stage] = 1;
                return false;
            }
        } else if (period > prev_la.step_length * LOW_BOUND) {
            las.pop_back();
            la = composite(p, prev_la, prev_lap1, &det);
            i = prev_la.step_length + prev_lap1.step_length;
            next_stage_la_index = 0;
            j = 2;
            double ratio = (double)period / (double)prev_la.step_length;
            double nth_root_d = std::log2((double)max_ref) /
                                (double)p.period_divisor;
            int64_t nth_root = llrint(nth_root_d);
            if (nth_root < 1) nth_root = 1;
            period = prev_la.step_length *
                     llrint(std::pow(ratio, 1.0 / (double)nth_root));
            period_begin = 0;
            period_end = period;
        }

        for (; j < prev_count;) {
            LANode pj = las[prev_idx + j];
            bool period_detected;
            LANode new_la = composite(p, la, pj, &period_detected);
            if (period_detected || i >= period_end) {
                la.step_length = i - period_begin;
                la.next_stage_la_index = next_stage_la_index;
                las.push_back(la);
                next_stage_la_index = j;
                period_begin = i;
                period_end = period_begin + period;
                LANode pjp1 = las[prev_idx + j + 1];
                if (detect_period(p, new_la, pjp1.ref) ||
                    j + 1 >= prev_count) {
                    la = pj;
                } else {
                    la = composite(p, pj, pjp1, &det);
                    i += pj.step_length;
                    j += 1;
                }
            } else {
                la = new_la;
            }
            i += las[prev_idx + j].step_length;
            j += 1;
        }

        la.step_length = i - period_begin;
        la.next_stage_la_index = next_stage_la_index;
        las.push_back(la);
        stage_macro_it_count[cur_stage] =
            (int64_t)las.size() - stage_la_index[cur_stage];
        las.push_back(new_node(p, gc(max_ref)));
        return stage_macro_it_count[cur_stage] >
               (p.low_bound > 1 ? p.low_bound : 1);
    }
};

}  // namespace

namespace {

// Stage-0 build (MT) + stage composition.  Returns false when the
// orbit yields no valid table (is_valid False in the Python builder).
bool la_build_run(Builder &b)
{
    if (b.max_ref <= 0) return false;
    const char *prog_env = std::getenv("FS_LA_PROGRESS");
    if (prog_env && !b.prog) b.prog = fopen(prog_env, "w");

    // FS_LA_RESERVE: expected node count — pre-sizes the node vector so
    // push_back never doubles.  At View #27 scale (426.6M nodes x 136 B
    // = 58 GB) an unreserved growth spike transiently holds 1.5x the
    // table and OOM-killed a finished build on a 125 GB box.
    const char *rs_env = std::getenv("FS_LA_RESERVE");
    if (rs_env) {
        int64_t rs = std::atoll(rs_env);
        if (rs > 0) b.las.reserve((size_t)rs);
    }

    // MT threshold mirrors the reference's 50k-iterations-per-thread
    // scaling (LAReference.cpp:239); FS_LA_MT forces a count (tests)
    int64_t n_threads = b.max_ref / 50000;
    int64_t hw = (int64_t)std::thread::hardware_concurrency();
    if (n_threads > hw) n_threads = hw;
    if (n_threads < 1) n_threads = 1;
    const char *mt_env = std::getenv("FS_LA_MT");
    if (mt_env) n_threads = std::max<int64_t>(1, std::atoll(mt_env));
    bool detected = b.create_la_from_orbit_mt(n_threads);
    if (detected) {
        while (b.create_new_la_stage()) {
        }
    }
    if (b.prog) {
        fprintf(b.prog,
                "{\"done\": true, \"detected\": %d, \"nodes\": %lld, "
                "\"stages\": %lld}\n",
                detected ? 1 : 0, (long long)b.las.size(),
                (long long)b.stage_count);
        fclose(b.prog);
        b.prog = nullptr;
    }
    return detected;
}

// AT creation + output marshalling for a finished build.
int64_t la_marshal(
    Builder &b,
    double radius_m, int64_t radius_e, int sub_is_f32, int64_t cap,
    double *ref_m, int64_t *ref_e, double *zc_m, int64_t *zc_e,
    double *cc_m, int64_t *cc_e, double *thr_m, int64_t *thr_e,
    double *thrc_m, int64_t *thrc_e,
    int64_t *step_length, int64_t *next_stage_la_index,
    int64_t *stage_la_index_out, int64_t *stage_macro_out,
    double *at_m, int64_t *at_e, int64_t *flags)
{
    flags[0] = 0;
    flags[1] = 0;
    flags[2] = 0;
    flags[3] = 0;

    // CreateATFromLA (LAReference.cpp:1052-1074)
    HD sqr_radius = hd_reduce(hd_mul({radius_m, radius_e},
                                     {radius_m, radius_e}));
    bool use_at = false;
    int64_t at_step = 0;
    HD at_thr_c = hd_zero(), at_sqr_esc = hd_zero();
    HDC at_ref_c = hdc_zero(), at_zc = hdc_zero(), at_cc = hdc_zero(),
        at_izc = hdc_zero();
    for (int64_t stage = b.stage_count - 1; stage >= 0; stage--) {
        int64_t idx = b.stage_la_index[stage];
        const LANode &node = b.las[idx];
        const LANode &next_node = b.las[idx + 1];
        // full-period window guard (see la_reference._create_at_from_la:
        // a sub-period AT window passes Usable at extreme depth yet
        // cannot model the per-window amplification of dc)
        if (node.step_length * 2 <= b.max_ref) continue;
        // _create_at
        HDC zc = node.zcoeff;
        HDC cc = hdc_mul(zc, node.ccoeff);
        HDC inv_zc = hdc_reciprocal(zc);
        HDC ref_c = hdc_mul(next_node.ref, zc);
        HD lim = {1.0, sub_is_f32 ? 32 : 256};
        HD sqr_esc = hd_min(hd_mul(hdc_norm_sqr(zc), node.la_threshold), lim);
        HD thr_c = hd_min(node.la_threshold_c, hd_div(lim, hdc_cheb(cc)));
        // _at_usable
        HD result = hd_mul(hd_mul(hdc_norm_sqr(cc), sqr_radius),
                           HD{1.0, 32});
        HD four = hd_from_double(4.0);
        bool usable = hd_lt(hdc_norm_sqr(ref_c), result) &&
                      hd_lt(four, sqr_esc);
        if (node.step_length > 0 && usable) {
            use_at = true;
            at_step = node.step_length;
            at_thr_c = thr_c;
            at_sqr_esc = sqr_esc;
            at_ref_c = ref_c;
            at_zc = zc;
            at_cc = cc;
            at_izc = inv_zc;
            break;
        }
    }

    int64_t n = (int64_t)b.las.size();
    if (n > cap || (int64_t)b.stage_la_index.size() > 1025) return -1;
    for (int64_t k = 0; k < n; k++) {
        const LANode &nd = b.las[k];
        ref_m[2 * k] = nd.ref.re;
        ref_m[2 * k + 1] = nd.ref.im;
        ref_e[k] = nd.ref.e;
        zc_m[2 * k] = nd.zcoeff.re;
        zc_m[2 * k + 1] = nd.zcoeff.im;
        zc_e[k] = nd.zcoeff.e;
        cc_m[2 * k] = nd.ccoeff.re;
        cc_m[2 * k + 1] = nd.ccoeff.im;
        cc_e[k] = nd.ccoeff.e;
        thr_m[k] = nd.la_threshold.m;
        thr_e[k] = nd.la_threshold.e;
        thrc_m[k] = nd.la_threshold_c.m;
        thrc_e[k] = nd.la_threshold_c.e;
        step_length[k] = nd.step_length;
        next_stage_la_index[k] = nd.next_stage_la_index;
    }
    for (size_t s = 0; s < b.stage_la_index.size(); s++) {
        stage_la_index_out[s] = b.stage_la_index[s];
        stage_macro_out[s] = b.stage_macro_it_count[s];
    }
    flags[0] = 1;
    flags[1] = use_at ? 1 : 0;
    flags[2] = at_step;
    flags[3] = b.stage_count;
    // AT payload: thr_c, sqr_esc (HD) then ref_c, zc, cc, izc (HDC)
    at_m[0] = at_thr_c.m;
    at_e[0] = at_thr_c.e;
    at_m[1] = at_sqr_esc.m;
    at_e[1] = at_sqr_esc.e;
    at_m[2] = at_ref_c.re;
    at_m[3] = at_ref_c.im;
    at_e[2] = at_ref_c.e;
    at_m[4] = at_zc.re;
    at_m[5] = at_zc.im;
    at_e[3] = at_zc.e;
    at_m[6] = at_cc.re;
    at_m[7] = at_cc.im;
    at_e[4] = at_cc.e;
    at_m[8] = at_izc.re;
    at_m[9] = at_izc.im;
    at_e[5] = at_izc.e;
    return n;
}

// Shared tail of the one-call entry points: build + marshal against a
// caller-preallocated table of `cap` rows.
int64_t la_generate_common(
    Builder &b, int64_t n_orbit,
    double radius_m, int64_t radius_e, int sub_is_f32, int64_t cap,
    double *ref_m, int64_t *ref_e, double *zc_m, int64_t *zc_e,
    double *cc_m, int64_t *cc_e, double *thr_m, int64_t *thr_e,
    double *thrc_m, int64_t *thrc_e,
    int64_t *step_length, int64_t *next_stage_la_index,
    int64_t *stage_la_index_out, int64_t *stage_macro_out,
    double *at_m, int64_t *at_e, int64_t *flags)
{
    flags[0] = 0;
    flags[1] = 0;
    flags[2] = 0;
    flags[3] = 0;
    if (b.max_ref <= 0) return 0;
    b.las.reserve((size_t)std::min<int64_t>(2 * n_orbit + 16, cap));
    if (!la_build_run(b)) {
        // mirror python: invalid table (is_valid False), nodes dropped
        return 0;
    }
    return la_marshal(
        b, radius_m, radius_e, sub_is_f32, cap,
        ref_m, ref_e, zc_m, zc_e, cc_m, cc_e, thr_m, thr_e,
        thrc_m, thrc_e, step_length, next_stage_la_index,
        stage_la_index_out, stage_macro_out, at_m, at_e, flags);
}

// Two-call protocol state: the finished Builder outlives the build
// call so the caller can size its output buffers to the EXACT node
// count instead of guessing a cap up front (the one-call API forced a
// preallocation guess that cost two wasted hour-long passes at View
// #27 scale before this existed).
struct LAHandle {
    Builder b;
    bool detected = false;
};

}  // namespace

extern "C" {

// Returns number of LA nodes written (>=0), -1 if capacity too small,
// 0 with flags[0]=0 when the orbit yields no valid LA table.
// flags: [0]=is_valid, [1]=use_at, [2]=at_step_length, [3]=stage_count
int64_t fs_la_generate(
    const double *orbit_x, const double *orbit_y, int64_t n_orbit,
    const int32_t *orbit_exp,  // nullable: per-entry 2^e scale (HDR orbit)
    double radius_m, int64_t radius_e,
    int detection_method, double la_threshold_scale,
    double la_threshold_c_scale, double stage0_pdt2, double pdt2,
    double stage0_pdt, double pdt, int period_divisor, int64_t low_bound,
    int sub_is_f32, int64_t cap,
    double *ref_m, int64_t *ref_e, double *zc_m, int64_t *zc_e,
    double *cc_m, int64_t *cc_e, double *thr_m, int64_t *thr_e,
    double *thrc_m, int64_t *thrc_e,
    int64_t *step_length, int64_t *next_stage_la_index,
    int64_t *stage_la_index_out, int64_t *stage_macro_out,
    double *at_m, int64_t *at_e, int64_t *flags)
{
    Builder b;
    b.p = {detection_method, la_threshold_scale, la_threshold_c_scale,
           stage0_pdt2, pdt2, stage0_pdt, pdt, period_divisor, low_bound};
    b.ox = orbit_x;
    b.oy = orbit_y;
    b.oe = orbit_exp;
    b.max_ref = n_orbit - 1;
    return la_generate_common(
        b, n_orbit, radius_m, radius_e, sub_is_f32, cap,
        ref_m, ref_e, zc_m, zc_e, cc_m, cc_e, thr_m, thr_e,
        thrc_m, thrc_e, step_length, next_stage_la_index,
        stage_la_index_out, stage_macro_out, at_m, at_e, flags);
}

// LA build straight from a COMPRESSED orbit (SimpleCompression anchors
// + uncompressed indices): the builder reads the orbit through the
// reconstructing accessor, so the uncompressed orbit never exists —
// the route to LA tables at period-billions scale (View #27 class,
// Notes/FractalShark-06-RefOrbit.tex:740-747).  Matches the reference,
// whose LA build reads PerturbationResults through the decompressing
// helpers (PerturbationResultsHelpers.h:51-161).  n_orbit =
// total_count (uncompressed length); cx/cy = the low-precision center
// (recurrence constants).  Values reconstruct exactly as
// CompressedOrbit.decompress does (plain f64; sub-f64 dips flushed —
// HDR-dip orbits need the uncompressed path).
int64_t fs_la_generate_rc(
    const double *anchors_x, const double *anchors_y,
    const int64_t *anchor_index, int64_t n_anchors, int64_t n_orbit,
    double cx_low, double cy_low,
    double radius_m, int64_t radius_e,
    int detection_method, double la_threshold_scale,
    double la_threshold_c_scale, double stage0_pdt2, double pdt2,
    double stage0_pdt, double pdt, int period_divisor, int64_t low_bound,
    int sub_is_f32, int64_t cap,
    double *ref_m, int64_t *ref_e, double *zc_m, int64_t *zc_e,
    double *cc_m, int64_t *cc_e, double *thr_m, int64_t *thr_e,
    double *thrc_m, int64_t *thrc_e,
    int64_t *step_length, int64_t *next_stage_la_index,
    int64_t *stage_la_index_out, int64_t *stage_macro_out,
    double *at_m, int64_t *at_e, int64_t *flags)
{
    Builder b;
    b.p = {detection_method, la_threshold_scale, la_threshold_c_scale,
           stage0_pdt2, pdt2, stage0_pdt, pdt, period_divisor, low_bound};
    b.ax = anchors_x;
    b.ay = anchors_y;
    b.ai = anchor_index;
    b.n_anchors = n_anchors;
    b.rc_cx = cx_low;
    b.rc_cy = cy_low;
    b.max_ref = n_orbit - 1;
    if (n_anchors <= 0) return 0;
    return la_generate_common(
        b, n_orbit, radius_m, radius_e, sub_is_f32, cap,
        ref_m, ref_e, zc_m, zc_e, cc_m, cc_e, thr_m, thr_e,
        thrc_m, thrc_e, step_length, next_stage_la_index,
        stage_la_index_out, stage_macro_out, at_m, at_e, flags);
}

// ---- two-call protocol -------------------------------------------------
// fs_la_begin_rc runs the FULL build (stage 0 + composition) from a
// compressed orbit and keeps the node table alive behind the returned
// handle; fs_la_result_n reports the exact node count (-2: no valid
// table), so the caller allocates output buffers of exactly that size
// and fs_la_collect marshals into them — no preallocation guessing.
// The anchor arrays only need to stay alive through fs_la_begin_rc.

void *fs_la_begin_rc(
    const double *anchors_x, const double *anchors_y,
    const int64_t *anchor_index, int64_t n_anchors, int64_t n_orbit,
    double cx_low, double cy_low,
    int detection_method, double la_threshold_scale,
    double la_threshold_c_scale, double stage0_pdt2, double pdt2,
    double stage0_pdt, double pdt, int period_divisor, int64_t low_bound)
{
    auto *h = new LAHandle;
    h->b.p = {detection_method, la_threshold_scale, la_threshold_c_scale,
              stage0_pdt2, pdt2, stage0_pdt, pdt, period_divisor,
              low_bound};
    h->b.ax = anchors_x;
    h->b.ay = anchors_y;
    h->b.ai = anchor_index;
    h->b.n_anchors = n_anchors;
    h->b.rc_cx = cx_low;
    h->b.rc_cy = cy_low;
    h->b.max_ref = n_orbit - 1;
    if (n_anchors <= 0 || h->b.max_ref <= 0) return h;
    h->b.las.reserve((size_t)std::min<int64_t>(2 * n_orbit + 16,
                                               int64_t{1} << 24));
    h->detected = la_build_run(h->b);
    return h;
}

int64_t fs_la_result_n(void *vh)
{
    auto *h = (LAHandle *)vh;
    return h->detected ? (int64_t)h->b.las.size() : -2;
}

int64_t fs_la_result_stages(void *vh)
{
    auto *h = (LAHandle *)vh;
    return (int64_t)h->b.stage_la_index.size();
}

int64_t fs_la_collect(
    void *vh, double radius_m, int64_t radius_e, int sub_is_f32,
    double *ref_m, int64_t *ref_e, double *zc_m, int64_t *zc_e,
    double *cc_m, int64_t *cc_e, double *thr_m, int64_t *thr_e,
    double *thrc_m, int64_t *thrc_e,
    int64_t *step_length, int64_t *next_stage_la_index,
    int64_t *stage_la_index_out, int64_t *stage_macro_out,
    double *at_m, int64_t *at_e, int64_t *flags)
{
    auto *h = (LAHandle *)vh;
    if (!h->detected) {
        flags[0] = 0;
        flags[1] = 0;
        flags[2] = 0;
        flags[3] = 0;
        return 0;
    }
    return la_marshal(
        h->b, radius_m, radius_e, sub_is_f32,
        (int64_t)h->b.las.size(),
        ref_m, ref_e, zc_m, zc_e, cc_m, cc_e, thr_m, thr_e,
        thrc_m, thrc_e, step_length, next_stage_la_index,
        stage_la_index_out, stage_macro_out, at_m, at_e, flags);
}

void fs_la_free(void *vh)
{
    delete (LAHandle *)vh;
}

}  // extern "C"
