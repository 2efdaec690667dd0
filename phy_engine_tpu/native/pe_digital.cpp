// Host-native levelled digital sweep engine.
//
// Role parity: the reference's digital runtime is a single-threaded
// C++ event-driven worklist (circuits/circuit.h:307-337 digital_clk,
// model/models/digital/*.h update_digital_clk).  This build replaces
// the worklist with pre-levelled full sweeps (digital/ir.py) and runs
// them three ways: XLA scan (CPU tests / virtual mesh), the Pallas MXU
// whole-tick program (digital/turbo.py, lane/instance-batched
// throughput), and THIS engine — a native bit-packed interpreter for
// latency-bound single-trace clocking, where per-kernel dispatch (XLA)
// or per-chunk MXU latency (Pallas) dominates and a tight host loop is
// the speed-of-light.  All backends consume the same lowered tables
// and are bit-exact under the two-plane Kleene encoding
// (digital/logic.py: 32 stimulus lanes per word, V/U planes).
//
// State layout: one uint64 per signal, V plane in the low 32 bits and
// U plane in the high 32 — a gate touches 2 random cache words instead
// of 4.
//
// Gate encoding (matches digital/turbo.py _GEN2_ENC):
//   op = core | inva<<3 | invb<<4 | invo<<5
//   cores: 0=AND 1=OR 2=XOR 3=CASE_EQ 4=TRI 5=RESOLVE2 6=IS_UNKNOWN
//
// Tick order (identical to digital/engine.py + turbo.py): forced
// INPUT planes -> input-cone settle -> FF segments (frozen reads) ->
// full settle.  The first tick of a run settles the WIDE cone (every
// INPUT's cone — covers constants and fresh X state); later ticks
// settle only the caller-computed NARROW cone (gates on paths from
// inputs that actually vary within the schedule to FF d/c/r pins) —
// bit-exact because unchanged inputs' cones already hold their
// fixpoint from the previous full settle.
//
// Flip-flops (DFF / DFF_ARSTN, d_ff.h:59-66 semantics): rows
// (d, c, r, q, lc) with rst_en selecting the async-reset overlay;
// segments read a frozen pre-segment snapshot (gather-then-write),
// reproducing the engine's simultaneous-within-segment rule.

#include <cstdint>
#include <cstring>

namespace {

inline uint64_t gate_eval(int32_t op, uint64_t a, uint64_t b) {
    uint32_t va = (uint32_t)a, ua = (uint32_t)(a >> 32);
    uint32_t vb = (uint32_t)b, ub = (uint32_t)(b >> 32);
    const uint32_t inva = (op & 8) ? ~0u : 0u;
    const uint32_t invb = (op & 16) ? ~0u : 0u;
    const uint32_t invo = (op & 32) ? ~0u : 0u;
    va = (va & ~inva) | (~va & ~ua & inva);
    vb = (vb & ~invb) | (~vb & ~ub & invb);
    const uint32_t h_a = va & ~ua, l_a = ~va & ~ua;
    const uint32_t h_b = vb & ~ub, l_b = ~vb & ~ub;
    uint32_t v, u;
    switch (op & 7) {
        case 0:  // AND
            v = h_a & h_b;
            u = ~(v | l_a | l_b);
            break;
        case 1:  // OR
            v = h_a | h_b;
            u = ~(v | (l_a & l_b));
            break;
        case 2: {  // XOR
            const uint32_t known = ~ua & ~ub;
            v = (va ^ vb) & known;
            u = ~known;
            break;
        }
        case 3:  // CASE_EQ
            v = ~(va ^ vb) & ~(ua ^ ub);
            u = 0;
            break;
        case 4: {  // TRI: a=data, b=en (logic.op_tri_state)
            const uint32_t eh = h_b, el = l_b;
            v = (eh & h_a) | el;
            u = (eh & ua) | el | ub;
            break;
        }
        case 5: {  // RESOLVE2 (logic.op_resolve2)
            const uint32_t az = ua & va;
            const uint32_t bz = ub & vb;
            const uint32_t eq = ~(va ^ vb) & ~(ua ^ ub);
            const uint32_t sel_b = az;
            const uint32_t sel_a = ~az & bz;
            const uint32_t sel_e = ~az & ~bz & eq;
            const uint32_t conflict = ~az & ~bz & ~eq;
            v = (sel_b & vb) | (sel_a & va) | (sel_e & va);
            u = (sel_b & ub) | (sel_a & ua) | (sel_e & ua) | conflict;
            break;
        }
        default:  // IS_UNKNOWN
            v = ua;
            u = 0;
            break;
    }
    v = (v & ~invo) | (~v & ~u & invo);
    return (uint64_t)v | ((uint64_t)u << 32);
}

template <int32_t OP>
static void run_op(const int32_t* a, const int32_t* b, const int32_t* o,
                   int32_t i0, int32_t i1, uint64_t* st) {
    for (int32_t i = i0; i < i1; ++i) {
        st[o[i]] = gate_eval(OP, st[a[i]], st[b[i]]);
    }
}

inline void sweep(const int32_t* op, const int32_t* a, const int32_t* b,
                  const int32_t* o, int32_t n, uint64_t* st) {
    // gates are op-sorted within each independent sub-level
    // (native_run.py), so dispatch once per run; the constant opcode
    // lets the compiler strip the decode and the core switch
    int32_t i = 0;
    while (i < n) {
        const int32_t cur = op[i];
        int32_t j = i + 1;
        while (j < n && op[j] == cur) { ++j; }
        switch (cur) {
            case 0:  run_op<0>(a, b, o, i, j, st); break;   // AND
            case 1:  run_op<1>(a, b, o, i, j, st); break;   // OR
            case 2:  run_op<2>(a, b, o, i, j, st); break;   // XOR
            case 8 | 0:  run_op<8 | 0>(a, b, o, i, j, st); break;
            case 16 | 0: run_op<16 | 0>(a, b, o, i, j, st); break;
            case 32 | 0: run_op<32 | 0>(a, b, o, i, j, st); break; // NAND/NOT
            case 32 | 1: run_op<32 | 1>(a, b, o, i, j, st); break; // NOR
            case 32 | 2: run_op<32 | 2>(a, b, o, i, j, st); break; // XNOR
            case 8 | 1:  run_op<8 | 1>(a, b, o, i, j, st); break;  // IMP
            case 16 | 1: run_op<16 | 1>(a, b, o, i, j, st); break;
            default:
                for (int32_t k = i; k < j; ++k) {
                    st[o[k]] = gate_eval(cur, st[a[k]], st[b[k]]);
                }
        }
        i = j;
    }
}

// Comb-feedback (gate-level latch) segments, evaluated with the
// levels engine's exact semantics: per segment, all gates read the
// PRE-segment state (Jacobi gather-then-write); segments apply
// sequentially; the whole pass (levels sweep + cyclic segments)
// repeats until the state stops changing or fix_budget passes ran —
// mirroring engine.py's lax.while_loop over comb_pass.
inline void jacobi_segments(const int32_t* cy_op, const int32_t* cy_a,
                            const int32_t* cy_b, const int32_t* cy_o,
                            const int32_t* cy_seg, int32_t n_cy_seg,
                            uint64_t* st, uint64_t* tmp) {
    for (int32_t s = 0; s < n_cy_seg; ++s) {
        const int32_t i0 = cy_seg[s], i1 = cy_seg[s + 1];
        for (int32_t i = i0; i < i1; ++i) {
            tmp[i - i0] = gate_eval(cy_op[i], st[cy_a[i]], st[cy_b[i]]);
        }
        for (int32_t i = i0; i < i1; ++i) {
            st[cy_o[i]] = tmp[i - i0];
        }
    }
}

}  // namespace

extern "C" {

// Run T ticks.  st (size K, v|u<<32 packed) is updated in place;
// HV/HU (T x S, uint32) record the post-tick planes of the first S
// signals.  The wide cone runs on tick 0 only; the narrow cone on
// ticks 1..T-1.  FF segment i covers rows [seg[i], seg[i+1]); scratch
// holds 6 * max_seg_len uint64.  Cyclic (gate-latch) segments: cy_*
// flat tables with cy_seg boundaries; fix_budget > 0 bounds the
// settle-to-fixpoint passes (0 = pure feed-forward, single sweep);
// snap is a K-word buffer for change detection and cy_tmp holds
// max-cyclic-segment words for the Jacobi gather.
void pe_digital_run(
    int32_t K, int32_t S, int32_t T, uint64_t* st,
    const int32_t* wc_op, const int32_t* wc_a, const int32_t* wc_b,
    const int32_t* wc_o, int32_t n_wide,
    const int32_t* nc_op, const int32_t* nc_a, const int32_t* nc_b,
    const int32_t* nc_o, int32_t n_narrow,
    const int32_t* full_op, const int32_t* full_a, const int32_t* full_b,
    const int32_t* full_o, int32_t n_full,
    const int32_t* cy_op, const int32_t* cy_a, const int32_t* cy_b,
    const int32_t* cy_o, const int32_t* cy_seg, int32_t n_cy_seg,
    int32_t fix_budget,
    const int32_t* ff_d, const int32_t* ff_c, const int32_t* ff_r,
    const int32_t* ff_q, const int32_t* ff_lc, const int32_t* ff_ren,
    const int32_t* seg, int32_t n_seg,
    const int32_t* fsig, int32_t nf, const uint32_t* FV, const uint32_t* FU,
    uint32_t* HV, uint32_t* HU, uint64_t* scratch,
    uint64_t* snap, uint64_t* cy_tmp) {
    (void)K;
    for (int32_t t = 0; t < T; ++t) {
        // 1. forced INPUT planes for this tick
        const uint32_t* fv = FV + (size_t)t * nf;
        const uint32_t* fu = FU + (size_t)t * nf;
        for (int32_t i = 0; i < nf; ++i) {
            st[fsig[i]] = (uint64_t)fv[i] | ((uint64_t)fu[i] << 32);
        }
        // 2. pre-sequential settle of the input cone (with feedback
        // present the cone IS the full program, and the cyclic
        // segments run once — engine.py's pre_fused single comb_pass)
        if (t == 0) {
            sweep(wc_op, wc_a, wc_b, wc_o, n_wide, st);
        } else {
            sweep(nc_op, nc_a, nc_b, nc_o, n_narrow, st);
        }
        if (n_cy_seg) {
            jacobi_segments(cy_op, cy_a, cy_b, cy_o, cy_seg, n_cy_seg,
                            st, cy_tmp);
        }
        // 3. flip-flops: per segment, snapshot reads then write
        for (int32_t s = 0; s < n_seg; ++s) {
            const int32_t i0 = seg[s], i1 = seg[s + 1];
            const int32_t n = i1 - i0;
            uint64_t* dd = scratch;
            uint64_t* cc = dd + n;
            uint64_t* qq = cc + n;
            uint64_t* ll = qq + n;
            uint64_t* rr = ll + n;
            for (int32_t k = 0; k < n; ++k) {
                const int32_t i = i0 + k;
                dd[k] = st[ff_d[i]];
                cc[k] = st[ff_c[i]];
                qq[k] = st[ff_q[i]];
                ll[k] = st[ff_lc[i]];
                if (ff_ren[i]) rr[k] = st[ff_r[i]];
            }
            for (int32_t k = 0; k < n; ++k) {
                const int32_t i = i0 + k;
                const uint32_t du = (uint32_t)(dd[k] >> 32);
                const uint32_t dv = (uint32_t)dd[k] & ~du;
                const uint32_t cu = (uint32_t)(cc[k] >> 32);
                const uint32_t cv = (uint32_t)cc[k] & ~cu;
                uint32_t qv = (uint32_t)qq[k];
                uint32_t qu = (uint32_t)(qq[k] >> 32);
                const uint32_t lv = (uint32_t)ll[k];
                const uint32_t lu = (uint32_t)(ll[k] >> 32);
                const uint32_t rise = (~lv & ~lu) & (cv & ~cu);
                const uint32_t known = ~cu;
                const uint32_t lv2 = (lv & ~known) | (cv & known);
                const uint32_t lu2 = lu & ~known;
                qv = (qv & ~rise) | (dv & rise);
                qu = (qu & ~rise) | (du & rise);
                if (ff_ren[i]) {
                    const uint32_t au = (uint32_t)(rr[k] >> 32);
                    const uint32_t av = (uint32_t)rr[k] & ~au;
                    const uint32_t a_l = ~av & ~au;
                    qv = qv & ~a_l & ~au;
                    qu = (qu & ~a_l) | au;
                }
                st[ff_q[i]] = (uint64_t)qv | ((uint64_t)qu << 32);
                st[ff_lc[i]] = (uint64_t)lv2 | ((uint64_t)lu2 << 32);
            }
        }
        // 4. full combinational settle; with feedback, repeat the
        // whole pass until nothing changes or the budget is spent
        sweep(full_op, full_a, full_b, full_o, n_full, st);
        if (n_cy_seg) {
            jacobi_segments(cy_op, cy_a, cy_b, cy_o, cy_seg, n_cy_seg,
                            st, cy_tmp);
            for (int32_t it = 1; it < fix_budget; ++it) {
                std::memcpy(snap, st, (size_t)K * sizeof(uint64_t));
                sweep(full_op, full_a, full_b, full_o, n_full, st);
                jacobi_segments(cy_op, cy_a, cy_b, cy_o, cy_seg,
                                n_cy_seg, st, cy_tmp);
                if (std::memcmp(snap, st,
                                (size_t)K * sizeof(uint64_t)) == 0) {
                    break;
                }
            }
        }
        // 5. record history planes
        uint32_t* hv = HV + (size_t)t * S;
        uint32_t* hu = HU + (size_t)t * S;
        for (int32_t i = 0; i < S; ++i) {
            hv[i] = (uint32_t)st[i];
            hu[i] = (uint32_t)(st[i] >> 32);
        }
    }
}

}  // extern "C"
