/* Native dependent-quantization trellis.
 *
 * C implementation of the 4-state Viterbi in vtm_tpu/ops/quant.py
 * quant_dep (encoder counterpart of DepQuant.cpp:806-1008 / quant:1582,
 * re-designed: candidate levels per state around the half-step pre-quant,
 * SSD in the scaled coefficient domain + lambda * bin-count rate model,
 * state transitions from the normative table).  Levels returned here are
 * reconstructed through the normative dequant_dep, so the Python and C
 * trellises are interchangeable encoder policies.
 *
 * Built on demand by vtm_tpu/native/__init__.py; quant_dep falls back to
 * the pure-Python Viterbi when the native build is unavailable.
 */
#define PY_SSIZE_T_CLEAN
#include <Python.h>
#include <stdint.h>
#include <stdlib.h>
#include <string.h>
#include <math.h>

#define DQ_STATE_TRANS 32040
#define INF 1e300

static inline int bitlen(long v) {
    int n = 0;
    while (v) { n++; v >>= 1; }
    return n;
}

static inline double dq_rate(long level) {
    if (level == 0) return 0.55;
    if (level == 1) return 3.0;       /* 2.0 + 1.0 */
    if (level <= 3) return 5.0;       /* 2.0 + 3.0 */
    long rem = (level - 4) >> 1;
    return 2.0 + 4.0 + 2.0 + (rem ? bitlen(rem) * 2.0 : 0.0);
}

/* trellis(u_int64[npos], lev_out_int32[npos], qbits, err_scale, lam)
 * -> 1 if levels were chosen, 0 if the all-zero block wins.
 * u holds scaled magnitudes in coding order (last .. DC); lev_out gets the
 * chosen |level| per position in the same order. */
static PyObject *trellis(PyObject *self, PyObject *args) {
    PyObject *u_obj, *lev_obj;
    int qbits;
    double err_scale, lam;
    if (!PyArg_ParseTuple(args, "OOidd", &u_obj, &lev_obj, &qbits,
                          &err_scale, &lam))
        return NULL;
    Py_buffer ub, lb;
    if (PyObject_GetBuffer(u_obj, &ub, PyBUF_CONTIG_RO) < 0) return NULL;
    if (PyObject_GetBuffer(lev_obj, &lb, PyBUF_CONTIG) < 0) {
        PyBuffer_Release(&ub);
        return NULL;
    }
    Py_ssize_t npos = ub.len / (Py_ssize_t)sizeof(int64_t);
    const int64_t *u = (const int64_t *)ub.buf;
    int32_t *lev = (int32_t *)lb.buf;
    int64_t half = 1ll << (qbits - 1);

    /* back[i][ns] = (prev_state << 24) | level */
    int32_t *back = (int32_t *)malloc((size_t)npos * 4 * sizeof(int32_t));
    if (!back) {
        PyBuffer_Release(&ub); PyBuffer_Release(&lb);
        return PyErr_NoMemory();
    }
    double cost[4] = {0.0, INF, INF, INF};
    double zero_run = 0.0;
    for (Py_ssize_t i = 0; i < npos; i++) {
        double up = (double)u[i];
        zero_run += up * up * err_scale;
        double ncost[4] = {INF, INF, INF, INF};
        int32_t *bk = back + i * 4;
        for (int s = 0; s < 4; s++) {
            double cs = cost[s];
            if (cs >= INF) continue;
            long hq = s >> 1;
            long l0 = (long)((u[i] + hq * half) >> qbits);
            long cands[3];
            int nc;
            if (l0 > 0) { cands[0] = 0; cands[1] = l0; cands[2] = l0 + 1; nc = 3; }
            else        { cands[0] = 0; cands[1] = 1; nc = 2; }
            for (int k = 0; k < nc; k++) {
                long lv = cands[k];
                if (i == 0 && lv == 0) continue;  /* last pos is significant */
                double e = lv > 0 ? up - (double)((2 * lv - hq) * half) : up;
                double c = cs + e * e * err_scale + lam * dq_rate(lv);
                int ns = (DQ_STATE_TRANS >> ((s << 2) + ((lv & 1) << 1))) & 3;
                if (c < ncost[ns]) {
                    ncost[ns] = c;
                    bk[ns] = (int32_t)((s << 24) | (int32_t)lv);
                }
            }
        }
        memcpy(cost, ncost, sizeof(cost));
    }
    int best_s = 0;
    for (int s = 1; s < 4; s++)
        if (cost[s] < cost[best_s]) best_s = s;
    int keep = cost[best_s] + lam * 4.0 < zero_run;
    memset(lev, 0, (size_t)npos * sizeof(int32_t));
    if (keep) {
        int s = best_s;
        for (Py_ssize_t i = npos - 1; i >= 0; i--) {
            int32_t b = back[i * 4 + s];
            lev[i] = b & 0xFFFFFF;
            s = (b >> 24) & 3;
        }
    }
    free(back);
    PyBuffer_Release(&ub);
    PyBuffer_Release(&lb);
    return PyLong_FromLong(keep);
}

/* ======================================================================
 * Context-aware TCQ trellis — behavioral equivalent of the reference
 * dependent quantizer (DepQuant.cpp:806-1560): 4 active + 4 previous +
 * 4 subblock-skip states, per-state neighbor-template tracking for
 * sig/gt1/par/gt2 context selection, adaptive go-Rice parameter,
 * remaining-context-bin budget, subblock significance flags, and
 * last-position offsets.  Rate tables (fractional bits per context) are
 * computed by the Python caller from the live CABAC estimator contexts
 * and passed in; scan/neighbor geometry tables come precomputed per
 * block size.
 * ====================================================================*/

#define SC_BITS 15
#define RICEMAX 32

typedef struct { int64_t rdCost; int32_t absLevel; int8_t prevId; } Dec;
typedef struct { int64_t deltaDist; int32_t absLevel; } PQ;

typedef struct {
    int64_t  rdCost;
    uint8_t  absLevels[16];
    uint16_t ctxInit[16];
    int8_t   numSigSbb;
    int32_t  remRegBins;
    int8_t   refSbbCtxId;
    int32_t  sbbFrac[2];
    int32_t  sigFrac[2];
    int32_t  coeffFrac[6];
    int8_t   goRicePar, goRiceZero;
} TState;

static const uint8_t g_riceParsCoeff[32] = {
    0,0,0,0,0,0,0,1,1,1,1,1,1,1,2,2,2,2,2,2,2,2,2,2,2,2,2,2,3,3,3,3 };

static int32_t g_riceBits[4][RICEMAX];
static int g_riceBitsInit = 0;

static void init_rice_bits(void) {
    /* golomb-rice code lengths (cutoff 5, maxLog2TrDynamicRange 15),
     * scaled by 2^15 — matches the arithmetic in cabac.c rem_abs_ep */
    for (int p = 0; p < 4; p++) {
        for (int prefix = 0;; prefix++) {
            int64_t base, size;
            int bits;
            if (prefix < 5) {
                base = (int64_t)prefix << p;
                size = 1ll << p;
                bits = prefix + 1 + p;
            } else {
                base = ((1ll << (prefix - 5)) + 4) << p;
                size = 1ll << (p + prefix - 5);
                bits = (prefix + 1) + p + (prefix - 5);
            }
            if (base >= RICEMAX) break;
            for (int64_t v = base; v < base + size && v < RICEMAX; v++)
                g_riceBits[p][v] = bits << SC_BITS;
        }
    }
    g_riceBitsInit = 1;
}

typedef struct {
    /* quantizer params */
    int     qShift;
    int64_t qAdd, maxQIdx, qScale;
    int64_t distStepAdd, distOrgFact, distAdd;
    int     distShift;
    /* geometry */
    int n, sbbSize, sbbMask, numSbb, widthInSbb;
    const int32_t *sbbPos;       /* scan sbb id -> raster sbb pos */
    const int32_t *scanX, *scanY;
    const int8_t  *nbsNum; const int32_t *nbs;   /* in-sbb, insidePos  */
    const int8_t  *nboNum; const int32_t *nbo;   /* out-sbb, scanIds   */
    const uint8_t *zeroOut;
    const int32_t *lastBits;     /* lastOffset per scanId */
    /* rate tables */
    const int32_t *sig;    /* [3][12][2] */
    const int32_t *gtx;    /* [21][6]    */
    const int32_t *sigSbb; /* [2][2]     */
    int chLuma;            /* 1 = luma   */
    int initRemRegBins;
} TCtx;

#define RD_MAX (0x7fffffffffffffffLL >> 1)
#define RD_MAX4 (0x7fffffffffffffffLL >> 2)

static void tst_init(TState *s) {
    s->rdCost = RD_MAX;
    s->numSigSbb = 0;
    s->remRegBins = 4;
    s->refSbbCtxId = -1;
    s->goRicePar = 0; s->goRiceZero = 0;
}

static void tst_init_tabs(TState *s, int slot, const TCtx *tc) {
    /* State::init(): sig bits = own ctx set entry 0, coeff bits = gtx[0] */
    int sigSet = slot <= 1 ? 0 : slot - 1;
    const int32_t *sg = tc->sig + (size_t)sigSet * 12 * 2;
    s->sigFrac[0] = sg[0]; s->sigFrac[1] = sg[1];
    memcpy(s->coeffFrac, tc->gtx, 6 * sizeof(int32_t));
    s->sbbFrac[0] = 0; s->sbbFrac[1] = 0;
}

static void pre_quant(const TCtx *tc, int64_t absCoeff, PQ pq[4]) {
    int64_t scaledOrg = absCoeff * tc->qScale;
    int64_t qIdx = (scaledOrg + tc->qAdd) >> tc->qShift;
    if (qIdx < 1) qIdx = 1;
    if (qIdx > tc->maxQIdx) qIdx = tc->maxQIdx;
    int64_t scaledAdd = qIdx * tc->distStepAdd - scaledOrg * tc->distOrgFact;
    for (int k = 0; k < 4; k++) {
        PQ *d = &pq[qIdx & 3];
        d->deltaDist = (scaledAdd * qIdx + tc->distAdd) >> tc->distShift;
        d->absLevel = (int32_t)((qIdx + 1) >> 1);
        scaledAdd += tc->distStepAdd;
        qIdx++;
    }
}

/* spt codes */
#define SP_ISCSBB 0
#define SP_SOCSBB 1
#define SP_EOCSBB 2

static void check_rd(const TState *st, int stateId, int spt,
                     const PQ *pqA, const PQ *pqB, Dec *dA, Dec *dB) {
    if (st->rdCost >= RD_MAX) return;
    const int32_t *rice = g_riceBits[(int)st->goRicePar];
    int64_t rdA = st->rdCost + pqA->deltaDist;
    int64_t rdB = st->rdCost + pqB->deltaDist;
    int64_t rdZ = st->rdCost;
    if (st->remRegBins >= 4) {
        if (pqA->absLevel < 4) rdA += st->coeffFrac[pqA->absLevel];
        else {
            unsigned v = (pqA->absLevel - 4) >> 1;
            rdA += st->coeffFrac[pqA->absLevel - (v << 1)]
                 + rice[v < RICEMAX ? v : RICEMAX - 1];
        }
        if (pqB->absLevel < 4) rdB += st->coeffFrac[pqB->absLevel];
        else {
            unsigned v = (pqB->absLevel - 4) >> 1;
            rdB += st->coeffFrac[pqB->absLevel - (v << 1)]
                 + rice[v < RICEMAX ? v : RICEMAX - 1];
        }
        if (spt == SP_ISCSBB) {
            rdA += st->sigFrac[1]; rdB += st->sigFrac[1]; rdZ += st->sigFrac[0];
        } else if (spt == SP_SOCSBB) {
            rdA += st->sbbFrac[1] + st->sigFrac[1];
            rdB += st->sbbFrac[1] + st->sigFrac[1];
            rdZ += st->sbbFrac[1] + st->sigFrac[0];
        } else if (st->numSigSbb) {
            rdA += st->sigFrac[1]; rdB += st->sigFrac[1]; rdZ += st->sigFrac[0];
        } else {
            rdZ = dA->rdCost;
        }
    } else {
        rdA += (1 << SC_BITS) + rice[pqA->absLevel <= st->goRiceZero
                ? pqA->absLevel - 1
                : (pqA->absLevel < RICEMAX ? pqA->absLevel : RICEMAX - 1)];
        rdB += (1 << SC_BITS) + rice[pqB->absLevel <= st->goRiceZero
                ? pqB->absLevel - 1
                : (pqB->absLevel < RICEMAX ? pqB->absLevel : RICEMAX - 1)];
        rdZ += rice[(int)st->goRiceZero];
    }
    if (rdA < dA->rdCost) { dA->rdCost = rdA; dA->absLevel = pqA->absLevel; dA->prevId = stateId; }
    if (rdZ < dA->rdCost) { dA->rdCost = rdZ; dA->absLevel = 0; dA->prevId = stateId; }
    if (rdB < dB->rdCost) { dB->rdCost = rdB; dB->absLevel = pqB->absLevel; dB->prevId = stateId; }
}

/* trellis_ctx(...) -> levels by scanId (int32[n]); returns 1 always */
static PyObject *trellis_ctx(PyObject *self, PyObject *args) {
    PyObject *o_abs, *o_lev, *o_sbbpos, *o_sx, *o_sy, *o_nbsn, *o_nbs,
        *o_nbon, *o_nbo, *o_zero, *o_last, *o_sig, *o_gtx, *o_sigsbb;
    int n, sbbSizeLog2, widthInSbb, chLuma, initRemRegBins, firstTestPos;
    int qShift, distShift;
    long long qAdd, maxQIdx, qScale, distStepAdd, distOrgFact, distAdd;
    if (!PyArg_ParseTuple(
            args, "OOiiiOOOOOOOOOOOiiLLLLLLii",
            &o_abs, &o_lev, &n, &sbbSizeLog2, &widthInSbb,
            &o_sbbpos, &o_sx, &o_sy, &o_nbsn, &o_nbs, &o_nbon, &o_nbo,
            &o_zero, &o_last, &o_sig, &o_gtx, /* 16 objs+ints so far */
            &chLuma, &initRemRegBins,
            &qAdd, &maxQIdx, &qScale, &distStepAdd, &distOrgFact, &distAdd,
            &qShift, &distShift))
        return NULL;
    /* sigSbb table rides at the end of o_sig?  Keep separate: parse extra */
    o_sigsbb = NULL;
    (void)o_sigsbb;
    if (!g_riceBitsInit) init_rice_bits();

    Py_buffer b_abs, b_lev, b_sbbpos, b_sx, b_sy, b_nbsn, b_nbs, b_nbon,
        b_nbo, b_zero, b_last, b_sig, b_gtx;
    if (PyObject_GetBuffer(o_abs, &b_abs, PyBUF_CONTIG_RO) < 0) return NULL;
#define GETBUF(obj, buf, flags)                                            \
    if (PyObject_GetBuffer(obj, &buf, flags) < 0) { return NULL; }
    GETBUF(o_lev, b_lev, PyBUF_CONTIG)
    GETBUF(o_sbbpos, b_sbbpos, PyBUF_CONTIG_RO)
    GETBUF(o_sx, b_sx, PyBUF_CONTIG_RO)
    GETBUF(o_sy, b_sy, PyBUF_CONTIG_RO)
    GETBUF(o_nbsn, b_nbsn, PyBUF_CONTIG_RO)
    GETBUF(o_nbs, b_nbs, PyBUF_CONTIG_RO)
    GETBUF(o_nbon, b_nbon, PyBUF_CONTIG_RO)
    GETBUF(o_nbo, b_nbo, PyBUF_CONTIG_RO)
    GETBUF(o_zero, b_zero, PyBUF_CONTIG_RO)
    GETBUF(o_last, b_last, PyBUF_CONTIG_RO)
    GETBUF(o_sig, b_sig, PyBUF_CONTIG_RO)
    GETBUF(o_gtx, b_gtx, PyBUF_CONTIG_RO)
#undef GETBUF

    TCtx tc;
    tc.qShift = qShift; tc.qAdd = qAdd; tc.maxQIdx = maxQIdx;
    tc.qScale = qScale; tc.distStepAdd = distStepAdd;
    tc.distOrgFact = distOrgFact; tc.distAdd = distAdd;
    tc.distShift = distShift;
    tc.n = n;
    tc.sbbSize = 1 << sbbSizeLog2;
    tc.sbbMask = tc.sbbSize - 1;
    tc.numSbb = n >> sbbSizeLog2;
    tc.widthInSbb = widthInSbb;
    tc.sbbPos = (const int32_t *)b_sbbpos.buf;
    tc.scanX = (const int32_t *)b_sx.buf;
    tc.scanY = (const int32_t *)b_sy.buf;
    tc.nbsNum = (const int8_t *)b_nbsn.buf;
    tc.nbs = (const int32_t *)b_nbs.buf;
    tc.nboNum = (const int8_t *)b_nbon.buf;
    tc.nbo = (const int32_t *)b_nbo.buf;
    tc.zeroOut = (const uint8_t *)b_zero.buf;
    tc.lastBits = (const int32_t *)b_last.buf;
    /* sig buffer layout: [3][12][2] sig | [2][2] sigSbb appended */
    tc.sig = (const int32_t *)b_sig.buf;
    tc.sigSbb = tc.sig + 3 * 12 * 2;
    tc.gtx = (const int32_t *)b_gtx.buf;
    tc.chLuma = chLuma;
    tc.initRemRegBins = initRemRegBins;
    firstTestPos = (int)(b_abs.len / sizeof(int64_t)) - 1;
    const int64_t *absc = (const int64_t *)b_abs.buf;
    int32_t *lev = (int32_t *)b_lev.buf;
    memset(lev, 0, (size_t)n * sizeof(int32_t));

    /* find first test position (|coeff| above the last-threshold) */
    int64_t thres = 4ll << tc.qShift;
    for (; firstTestPos >= 0; firstTestPos--) {
        if (tc.zeroOut[firstTestPos]) continue;
        if (absc[firstTestPos] * tc.qScale * 4 > thres) break;
    }
    int ok = 1;
    if (firstTestPos >= 0) {
        TState statesA[4], statesB[4], skipA[4];
        TState *cur = statesA, *prv = statesB, *skip = skipA;
        for (int k = 0; k < 4; k++) {
            tst_init(&cur[k]); tst_init(&prv[k]); tst_init(&skip[k]);
            tst_init_tabs(&cur[k], k, &tc);
            tst_init_tabs(&prv[k], k, &tc);
            tst_init_tabs(&skip[k], k, &tc);
        }
        TState start; tst_init(&start); tst_init_tabs(&start, 0, &tc);
        /* per-state constant rate arrays by slot id */
        /* common ctx: 8 chunks of numSbb flags + n levels */
        size_t chunk = (size_t)tc.numSbb + (size_t)n;
        uint8_t *cmem = (uint8_t *)calloc(8 * chunk, 1);
        Dec *trel = (Dec *)malloc((size_t)n * 8 * sizeof(Dec));
        if (!cmem || !trel) {
            free(cmem); free(trel);
            ok = 0;
        } else {
        uint8_t *sbbCur[4], *sbbPrv[4], *levCur[4], *levPrv[4];
        for (int k = 0; k < 4; k++) {
            sbbCur[k] = cmem + (size_t)k * chunk;
            levCur[k] = sbbCur[k] + tc.numSbb;
            sbbPrv[k] = cmem + (size_t)(k + 4) * chunk;
            levPrv[k] = sbbPrv[k] + tc.numSbb;
        }
        int32_t sbbFlagBits[2][2] = {
            { tc.sigSbb[0], tc.sigSbb[1] }, { tc.sigSbb[2], tc.sigSbb[3] } };
        const int nSigCtx = 12;
        for (int scanIdx = firstTestPos; scanIdx >= 0; scanIdx--) {
            int insidePos = scanIdx & tc.sbbMask;
            int eosbb = (insidePos == 0);
            int spt = SP_ISCSBB;
            if (insidePos == tc.sbbMask && scanIdx > tc.sbbSize &&
                scanIdx < n - 1)
                spt = SP_SOCSBB;
            else if (eosbb && scanIdx > 0 && scanIdx < n - tc.sbbSize)
                spt = SP_EOCSBB;
            /* ---- xDecide ---- */
            Dec *dec = trel + (size_t)scanIdx * 8;
            for (int k = 0; k < 4; k++) {
                dec[k].rdCost = RD_MAX4; dec[k].absLevel = 0; dec[k].prevId = -2;
                /* rows 4..7: skip-chain propagation (level 0, link to
                 * the same skip slot; reconnected at eosbb rows) */
                dec[4 + k].rdCost = RD_MAX4; dec[4 + k].absLevel = 0;
                dec[4 + k].prevId = (int8_t)(4 + k);
            }
            { TState *t = prv; prv = cur; cur = t; }
            if (tc.zeroOut[scanIdx]) {
                if (spt == SP_EOCSBB) {
                    for (int k = 0; k < 4; k++) {
                        dec[k].rdCost = skip[k].rdCost + skip[k].sbbFrac[0];
                        dec[k].absLevel = 0; dec[k].prevId = 4 + k;
                    }
                }
            } else {
                PQ pq[4];
                pre_quant(&tc, absc[scanIdx], pq);
                check_rd(&prv[0], 0, spt, &pq[0], &pq[2], &dec[0], &dec[2]);
                check_rd(&prv[1], 1, spt, &pq[0], &pq[2], &dec[2], &dec[0]);
                check_rd(&prv[2], 2, spt, &pq[3], &pq[1], &dec[1], &dec[3]);
                check_rd(&prv[3], 3, spt, &pq[3], &pq[1], &dec[3], &dec[1]);
                if (spt == SP_EOCSBB) {
                    for (int k = 0; k < 4; k++) {
                        if (skip[k].rdCost >= RD_MAX) continue;
                        int64_t rd = skip[k].rdCost + skip[k].sbbFrac[0];
                        if (rd < dec[k].rdCost) {
                            dec[k].rdCost = rd; dec[k].absLevel = 0;
                            dec[k].prevId = 4 + k;
                        }
                    }
                }
                /* start state: pay last-position offset */
                for (int j = 0; j < 2; j++) {
                    const PQ *p = j ? &pq[2] : &pq[0];
                    Dec *d = j ? &dec[2] : &dec[0];
                    int64_t rd = p->deltaDist + tc.lastBits[scanIdx];
                    if (p->absLevel < 4) rd += start.coeffFrac[p->absLevel];
                    else {
                        unsigned v = (p->absLevel - 4) >> 1;
                        rd += start.coeffFrac[p->absLevel - (v << 1)]
                            + g_riceBits[0][v < RICEMAX ? v : RICEMAX - 1];
                    }
                    if (rd < d->rdCost) {
                        d->rdCost = rd; d->absLevel = p->absLevel;
                        d->prevId = -1;
                    }
                }
            }
            if (scanIdx == 0) break;
            /* ---- update states ---- */
            int nextScan = scanIdx - 1;
            int diag = tc.scanX[nextScan] + tc.scanY[nextScan];
            int sigOff, gtxOff;
            if (tc.chLuma) {
                sigOff = diag < 2 ? 8 : diag < 5 ? 4 : 0;
                gtxOff = diag < 1 ? 16 : diag < 3 ? 11 : diag < 10 ? 6 : 1;
            } else {
                sigOff = diag < 2 ? 4 : 0;
                gtxOff = diag < 1 ? 6 : 1;
            }
            int nextInside = nextScan & tc.sbbMask;
            if (eosbb) {
                /* swap sbb ctx chunks */
                for (int k = 0; k < 4; k++) {
                    uint8_t *t1 = sbbCur[k]; sbbCur[k] = sbbPrv[k]; sbbPrv[k] = t1;
                    uint8_t *t2 = levCur[k]; levCur[k] = levPrv[k]; levPrv[k] = t2;
                }
                int sbbScanId = scanIdx >> sbbSizeLog2;
                int sbbRaster = tc.sbbPos[sbbScanId];
                int nextSbbScan = nextScan >> sbbSizeLog2;
                int nextSbbRaster = tc.sbbPos[nextSbbScan];
                int nsY = nextSbbRaster / tc.widthInSbb;
                int nsX = nextSbbRaster - nsY * tc.widthInSbb;
                int sbbRight = nsX < tc.widthInSbb - 1 ? nextSbbRaster + 1 : 0;
                int sbbBelow = (nsY < (tc.numSbb / tc.widthInSbb) - 1)
                                   ? nextSbbRaster + tc.widthInSbb : 0;
                for (int k = 0; k < 4; k++) {
                    TState *st = &cur[k];
                    const Dec *d = &dec[k];
                    st->rdCost = d->rdCost;
                    if (d->prevId <= -2) {
                        tst_init(st); tst_init_tabs(st, k, &tc);
                        st->rdCost = d->rdCost; continue;
                    }
                    const TState *pv = NULL;
                    if (d->prevId >= 4) {
                        pv = &skip[d->prevId - 4];
                        st->numSigSbb = 0;
                        memset(st->absLevels, 0, 16);
                    } else if (d->prevId >= 0) {
                        pv = &prv[d->prevId];
                        st->numSigSbb = pv->numSigSbb + (d->absLevel != 0);
                        memcpy(st->absLevels, pv->absLevels, 16);
                    } else {
                        st->numSigSbb = 1;
                        memset(st->absLevels, 0, 16);
                    }
                    st->absLevels[insidePos] =
                        d->absLevel < 255 ? (uint8_t)d->absLevel : 255;
                    /* CommonCtx::update */
                    uint8_t *flags = sbbCur[k], *lvls = levCur[k];
                    if (pv && pv->refSbbCtxId >= 0) {
                        memcpy(flags, sbbPrv[pv->refSbbCtxId], tc.numSbb);
                        memcpy(lvls + scanIdx, levPrv[pv->refSbbCtxId] + scanIdx,
                               (size_t)(n - scanIdx));
                    } else {
                        memset(flags, 0, tc.numSbb);
                        memset(lvls + scanIdx, 0, (size_t)(n - scanIdx));
                    }
                    flags[sbbRaster] = st->numSigSbb != 0;
                    memcpy(lvls + scanIdx, st->absLevels, tc.sbbSize);
                    int sigNSbb = ((sbbRight && flags[sbbRight]) ||
                                   (sbbBelow && flags[sbbBelow])) ? 1 : 0;
                    st->numSigSbb = 0;
                    st->remRegBins = pv ? pv->remRegBins : tc.initRemRegBins;
                    st->goRicePar = 0;
                    st->refSbbCtxId = (int8_t)k;
                    st->sbbFrac[0] = sbbFlagBits[sigNSbb][0];
                    st->sbbFrac[1] = sbbFlagBits[sigNSbb][1];
                    /* template init for next sbb from out-neighbours */
                    int scanBeg = scanIdx - tc.sbbSize;
                    for (int id = 0; id < tc.sbbSize; id++) {
                        int sp = scanBeg + id;
                        int num = tc.nboNum[sp];
                        if (!num) { st->ctxInit[id] = 0; continue; }
                        int sumAbs = 0, sumAbs1 = 0, sumNum = 0;
                        const int32_t *nb = tc.nbo + (size_t)sp * 5;
                        for (int q = 0; q < num; q++) {
                            int t = lvls[nb[q]];
                            sumAbs += t;
                            sumAbs1 += t < 4 + (t & 1) ? t : 4 + (t & 1);
                            sumNum += t != 0;
                        }
                        if (sumAbs > 127) sumAbs = 127;
                        st->ctxInit[id] = (uint16_t)(sumNum + (sumAbs1 << 3)
                                                     + (sumAbs << 8));
                    }
                    memset(st->absLevels, 0, 16);
                    /* sig/gtx bits for next position */
                    int tinit = st->ctxInit[nextInside];
                    int sumNum = tinit & 7, sumAbs1 = (tinit >> 3) & 31;
                    int sumGt1 = sumAbs1 - sumNum;
                    int sigSet = k <= 1 ? 0 : k - 1;
                    int a1 = (sumAbs1 + 1) >> 1; if (a1 > 3) a1 = 3;
                    const int32_t *sg = tc.sig + ((size_t)sigSet * nSigCtx
                                                  + sigOff + a1) * 2;
                    st->sigFrac[0] = sg[0]; st->sigFrac[1] = sg[1];
                    int g1 = sumGt1 < 4 ? sumGt1 : 4;
                    memcpy(st->coeffFrac, tc.gtx + (size_t)(gtxOff + g1) * 6,
                           6 * sizeof(int32_t));
                }
                memcpy(dec + 4, dec, 4 * sizeof(Dec));
            } else if (!tc.zeroOut[scanIdx]) {
                for (int k = 0; k < 4; k++) {
                    TState *st = &cur[k];
                    const Dec *d = &dec[k];
                    st->rdCost = d->rdCost;
                    if (d->prevId <= -2) { int64_t rd = d->rdCost;
                        tst_init(st); tst_init_tabs(st, k, &tc);
                        st->rdCost = rd; continue; }
                    const TState *pv = d->prevId >= 0 ? &prv[d->prevId] : NULL;
                    if (pv) {
                        st->numSigSbb = pv->numSigSbb + (d->absLevel != 0);
                        st->refSbbCtxId = pv->refSbbCtxId;
                        st->sbbFrac[0] = pv->sbbFrac[0];
                        st->sbbFrac[1] = pv->sbbFrac[1];
                        st->remRegBins = pv->remRegBins - 1;
                        st->goRicePar = pv->goRicePar;
                        if (st->remRegBins >= 4)
                            st->remRegBins -=
                                d->absLevel < 2 ? d->absLevel : 3;
                        memcpy(st->absLevels, pv->absLevels, 16);
                        memcpy(st->ctxInit, pv->ctxInit, 32);
                    } else {
                        st->numSigSbb = 1;
                        st->refSbbCtxId = -1;
                        st->remRegBins = tc.initRemRegBins -
                            (d->absLevel < 2 ? d->absLevel : 3);
                        memset(st->absLevels, 0, 16);
                        memset(st->ctxInit, 0, 32);
                    }
                    st->absLevels[insidePos] =
                        d->absLevel < 255 ? (uint8_t)d->absLevel : 255;
                    int num = tc.nbsNum[nextScan];
                    const int32_t *nb = tc.nbs + (size_t)nextScan * 5;
                    if (st->remRegBins >= 4) {
                        int tinit = st->ctxInit[nextInside];
                        int sumAbs1 = (tinit >> 3) & 31;
                        int sumNum = tinit & 7;
                        for (int q = 0; q < num; q++) {
                            int t = st->absLevels[nb[q]];
                            sumAbs1 += t < 4 + (t & 1) ? t : 4 + (t & 1);
                            sumNum += t != 0;
                        }
                        int sumGt1 = sumAbs1 - sumNum;
                        int sigSet = k <= 1 ? 0 : k - 1;
                        int a1 = (sumAbs1 + 1) >> 1; if (a1 > 3) a1 = 3;
                        const int32_t *sg = tc.sig + ((size_t)sigSet * nSigCtx
                                                      + sigOff + a1) * 2;
                        st->sigFrac[0] = sg[0]; st->sigFrac[1] = sg[1];
                        int g1 = sumGt1 < 4 ? sumGt1 : 4;
                        memcpy(st->coeffFrac,
                               tc.gtx + (size_t)(gtxOff + g1) * 6,
                               6 * sizeof(int32_t));
                        int sumAbs = st->ctxInit[nextInside] >> 8;
                        for (int q = 0; q < num; q++)
                            sumAbs += st->absLevels[nb[q]];
                        int sumAll = sumAbs - 4 * 5;
                        if (sumAll < 0) sumAll = 0;
                        if (sumAll > 31) sumAll = 31;
                        st->goRicePar = (int8_t)g_riceParsCoeff[sumAll];
                    } else {
                        int sumAbs = st->ctxInit[nextInside] >> 8;
                        for (int q = 0; q < num; q++)
                            sumAbs += st->absLevels[nb[q]];
                        if (sumAbs > 31) sumAbs = 31;
                        st->goRicePar = (int8_t)g_riceParsCoeff[sumAbs];
                        st->goRiceZero =
                            (int8_t)((k < 2 ? 1 : 2) << st->goRicePar);
                    }
                }
            }
            if (spt == SP_SOCSBB) {
                TState *t = prv; prv = skip; skip = t;
            }
        }
        /* ---- best path + backward scan ---- */
        int bestId = -2;
        int64_t best = 0;
        for (int k = 0; k < 4; k++) {
            if (trel[k].rdCost < best) { best = trel[k].rdCost; bestId = k; }
        }
        for (int scanIdx = 0; bestId >= 0; scanIdx++) {
            Dec *d = trel + (size_t)scanIdx * 8 + bestId;
            lev[scanIdx] = d->absLevel;
            bestId = d->prevId;
        }
        free(cmem); free(trel);
        }
    }
    PyBuffer_Release(&b_abs); PyBuffer_Release(&b_lev);
    PyBuffer_Release(&b_sbbpos); PyBuffer_Release(&b_sx);
    PyBuffer_Release(&b_sy); PyBuffer_Release(&b_nbsn);
    PyBuffer_Release(&b_nbs); PyBuffer_Release(&b_nbon);
    PyBuffer_Release(&b_nbo); PyBuffer_Release(&b_zero);
    PyBuffer_Release(&b_last); PyBuffer_Release(&b_sig);
    PyBuffer_Release(&b_gtx);
    if (!ok) return PyErr_NoMemory();
    Py_RETURN_NONE;
}

static PyMethodDef methods[] = {
    {"trellis", trellis, METH_VARARGS,
     "4-state dep-quant Viterbi over scaled magnitudes"},
    {"trellis_ctx", trellis_ctx, METH_VARARGS,
     "context-aware TCQ trellis (DepQuant behavioral equivalent)"},
    {NULL, NULL, 0, NULL},
};

static struct PyModuleDef mod = {
    PyModuleDef_HEAD_INIT, "_depquant_native", NULL, -1, methods,
};

PyMODINIT_FUNC PyInit__depquant_native(void) { return PyModule_Create(&mod); }
