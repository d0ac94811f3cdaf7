// Dump VVC normative constant tables from the reference build into a simple
// binary container consumed by tools/rom_to_npz.py.  These are spec-defined
// constants (transform matrices, CABAC init values, scan orders, MIP/LFNST
// weights, filter taps) that any conforming implementation must contain
// bit-identically — extracting them via the linker guarantees zero
// transcription errors.  No reference *logic* is reused.
//
// Build/run: see tools/make_rom.sh
#include <cstdio>
#include <cstdint>
#include <cstring>
#include <string>
#include <vector>

#include "CommonLib/Rom.h"
#include "CommonLib/Contexts.h"
#include "CommonLib/InterpolationFilter.h"
#include "CommonLib/MipData.h"
#include "CommonLib/AdaptiveLoopFilter.h"

static FILE* g_out;

static void write_u32(uint32_t v) { fwrite(&v, 4, 1, g_out); }

static void write_header(const char* name, std::vector<uint32_t> dims)
{
  uint32_t n = (uint32_t)strlen(name);
  write_u32(n);
  fwrite(name, 1, n, g_out);
  write_u32((uint32_t)dims.size());
  for (uint32_t d : dims) write_u32(d);
}

template<typename T>
static void dump(const char* name, const T* data, std::vector<uint32_t> dims)
{
  write_header(name, dims);
  size_t n = 1;
  for (uint32_t d : dims) n *= d;
  for (size_t i = 0; i < n; i++) { int32_t v = (int32_t)data[i]; fwrite(&v, 4, 1, g_out); }
}

static void dump_scalar2(const char* name, uint32_t a, uint32_t b)
{
  uint32_t v[2] = { a, b };
  dump(name, v, { 2 });
}

int main(int argc, char** argv)
{
  initROM();
  g_out = fopen(argc > 1 ? argv[1] : "rom.bin", "wb");
  fwrite("ROMDUMP1", 1, 8, g_out);

  // ---- transform cores (fwd @14-bit or 6-bit per build, inv @6-bit) ----
  dump("trDCT2P2",  &g_trCoreDCT2P2 [0][0][0], {2, 2, 2});
  dump("trDCT2P4",  &g_trCoreDCT2P4 [0][0][0], {2, 4, 4});
  dump("trDCT2P8",  &g_trCoreDCT2P8 [0][0][0], {2, 8, 8});
  dump("trDCT2P16", &g_trCoreDCT2P16[0][0][0], {2, 16, 16});
  dump("trDCT2P32", &g_trCoreDCT2P32[0][0][0], {2, 32, 32});
  dump("trDCT2P64", &g_trCoreDCT2P64[0][0][0], {2, 64, 64});
  dump("trDCT8P4",  &g_trCoreDCT8P4 [0][0][0], {2, 4, 4});
  dump("trDCT8P8",  &g_trCoreDCT8P8 [0][0][0], {2, 8, 8});
  dump("trDCT8P16", &g_trCoreDCT8P16[0][0][0], {2, 16, 16});
  dump("trDCT8P32", &g_trCoreDCT8P32[0][0][0], {2, 32, 32});
  dump("trDST7P4",  &g_trCoreDST7P4 [0][0][0], {2, 4, 4});
  dump("trDST7P8",  &g_trCoreDST7P8 [0][0][0], {2, 8, 8});
  dump("trDST7P16", &g_trCoreDST7P16[0][0][0], {2, 16, 16});
  dump("trDST7P32", &g_trCoreDST7P32[0][0][0], {2, 32, 32});

  // ---- LFNST ----
  dump("lfnst4x4", &g_lfnst4x4[0][0][0][0], {4, 2, 16, 16});
  dump("lfnst8x8", &g_lfnst8x8[0][0][0][0], {4, 2, 16, 48});
  dump("lfnstLut", &g_lfnstLut[0], {NUM_INTRA_MODE + NUM_EXT_LUMA_MODE - 1});

  // ---- MIP ----
  dump("mipMatrix4x4",   &mipMatrix4x4[0][0][0],   {16, 16, 4});
  dump("mipMatrix8x8",   &mipMatrix8x8[0][0][0],   {8, 16, 8});
  dump("mipMatrix16x16", &mipMatrix16x16[0][0][0], {6, 64, 7});

  // ---- quant ----
  dump("quantScales",    &g_quantScales[0][0],    {2, SCALING_LIST_REM_NUM});
  dump("invQuantScales", &g_invQuantScales[0][0], {2, SCALING_LIST_REM_NUM});
  dump("quantTSDefault4x4",    g_quantTSDefault4x4,    {16});
  dump("quantIntraDefault8x8", g_quantIntraDefault8x8, {64});
  dump("quantInterDefault8x8", g_quantInterDefault8x8, {64});

  // ---- residual coding aux ----
  dump("groupIdx",        g_uiGroupIdx,        {MAX_TB_SIZEY});
  dump("minInGroup",      g_uiMinInGroup,      {LAST_SIGNIFICANT_GROUPS});
  dump("goRiceParsCoeff", g_auiGoRiceParsCoeff, {32});
  dump("log2SbbSize",     &g_log2SbbSize[0][0][0], {MAX_CU_DEPTH + 1, MAX_CU_DEPTH + 1, 2});

  // ---- scan orders (after initROM) ----
  // g_scanOrder[group][SCAN_DIAG][log2w][log2h] → (idx,x,y) per coefficient
  for (int g = 0; g < SCAN_NUMBER_OF_GROUP_TYPES; g++) {
    for (uint32_t lw = 0; lw <= 6; lw++) {
      for (uint32_t lh = 0; lh <= 6; lh++) {
        const uint32_t w = 1u << lw, h = 1u << lh;
        const ScanElement* s = g_scanOrder[g][SCAN_DIAG][gp_sizeIdxInfo->idxFrom(w)][gp_sizeIdxInfo->idxFrom(h)];
        if (!s) continue;
        std::vector<int32_t> buf;
        buf.reserve(w * h * 3);
        for (uint32_t i = 0; i < w * h; i++) {
          buf.push_back((int32_t)s[i].idx);
          buf.push_back((int32_t)s[i].x);
          buf.push_back((int32_t)s[i].y);
        }
        char name[64];
        snprintf(name, sizeof(name), "scan_g%d_%ux%u", g, w, h);
        dump(name, buf.data(), {w * h, 3});
      }
    }
  }

  // ---- LFNST 8x8 top-left diagonal scan (idx,x,y) per block width ----
  for (uint32_t lw = 2; lw <= 6; lw++) {
    const uint32_t w = 1u << lw;
    const ScanElement* s = g_coefTopLeftDiagScan8x8[gp_sizeIdxInfo->idxFrom(w)];
    std::vector<int32_t> buf;
    for (int i = 0; i < 64; i++) {
      buf.push_back((int32_t)s[i].idx);
      buf.push_back((int32_t)s[i].x);
      buf.push_back((int32_t)s[i].y);
    }
    char name[64];
    snprintf(name, sizeof(name), "scanTL8x8_w%u", w);
    dump(name, buf.data(), {64, 3});
  }

  // ---- CABAC context init tables: [B, P, I, windowSizes] flattened ----
  for (unsigned id = 0; id < 4; id++) {
    const std::vector<uint8_t>& t = ContextSetCfg::getInitTable(id);
    char name[32];
    snprintf(name, sizeof(name), "ctxInit%u", id);
    dump(name, t.data(), {(uint32_t)t.size()});
  }
#define DUMP_CTXSET(X) dump_scalar2("ctxoff_" #X, ContextSetCfg::X.Offset, ContextSetCfg::X.Size)
#define DUMP_CTXSET_ARR(X, N) do { \
    for (int i = 0; i < N; i++) { \
      char nm[64]; snprintf(nm, sizeof(nm), "ctxoff_" #X "_%d", i); \
      dump_scalar2(nm, ContextSetCfg::X[i].Offset, ContextSetCfg::X[i].Size); \
    } } while (0)
  DUMP_CTXSET(SplitFlag); DUMP_CTXSET(SplitQtFlag); DUMP_CTXSET(SplitHvFlag);
  DUMP_CTXSET(Split12Flag); DUMP_CTXSET(ModeConsFlag); DUMP_CTXSET(SkipFlag);
  DUMP_CTXSET(MergeFlag); DUMP_CTXSET(RegularMergeFlag); DUMP_CTXSET(MergeIdx);
  DUMP_CTXSET(PredMode); DUMP_CTXSET(MultiRefLineIdx); DUMP_CTXSET(IntraLumaMpmFlag);
  DUMP_CTXSET(IntraLumaPlanarFlag); DUMP_CTXSET(CclmModeFlag); DUMP_CTXSET(CclmModeIdx);
  DUMP_CTXSET(IntraChromaPredMode); DUMP_CTXSET(MipFlag); DUMP_CTXSET(DeltaQP);
  DUMP_CTXSET(InterDir); DUMP_CTXSET(RefPic); DUMP_CTXSET(MmvdFlag);
  DUMP_CTXSET(MmvdMergeIdx); DUMP_CTXSET(MmvdStepMvpIdx); DUMP_CTXSET(SubblockMergeFlag);
  DUMP_CTXSET(AffineFlag); DUMP_CTXSET(AffineType); DUMP_CTXSET(AffMergeIdx);
  DUMP_CTXSET(Mvd); DUMP_CTXSET(BDPCMMode); DUMP_CTXSET(QtRootCbf); DUMP_CTXSET(ACTFlag);
  DUMP_CTXSET_ARR(QtCbf, 3); DUMP_CTXSET_ARR(SigCoeffGroup, 2); DUMP_CTXSET_ARR(LastX, 2);
  DUMP_CTXSET_ARR(LastY, 2); DUMP_CTXSET_ARR(SigFlag, 6); DUMP_CTXSET_ARR(ParFlag, 2);
  DUMP_CTXSET_ARR(GtxFlag, 4);
  DUMP_CTXSET(TsSigCoeffGroup); DUMP_CTXSET(TsSigFlag); DUMP_CTXSET(TsParFlag);
  DUMP_CTXSET(TsGtxFlag); DUMP_CTXSET(TsLrg1Flag); DUMP_CTXSET(TsResidualSign);
  DUMP_CTXSET(MVPIdx); DUMP_CTXSET(SaoMergeFlag); DUMP_CTXSET(SaoTypeIdx);
  DUMP_CTXSET(TransformSkipFlag); DUMP_CTXSET(MTSIdx); DUMP_CTXSET(LFNSTIdx);
  DUMP_CTXSET(PLTFlag); DUMP_CTXSET(RotationFlag); DUMP_CTXSET(RunTypeFlag);
  DUMP_CTXSET(IdxRunModel); DUMP_CTXSET(CopyRunModel); DUMP_CTXSET(RdpcmFlag);
  DUMP_CTXSET(RdpcmDir); DUMP_CTXSET(SbtFlag); DUMP_CTXSET(SbtQuadFlag);
  DUMP_CTXSET(SbtHorFlag); DUMP_CTXSET(SbtPosFlag); DUMP_CTXSET(CrossCompPred);
  DUMP_CTXSET(ChromaQpAdjFlag); DUMP_CTXSET(ChromaQpAdjIdc); DUMP_CTXSET(ImvFlag);
  DUMP_CTXSET(BcwIdx); DUMP_CTXSET(ctbAlfFlag); DUMP_CTXSET(ctbAlfAlternative);
  DUMP_CTXSET(AlfUseTemporalFilt); DUMP_CTXSET(CcAlfFilterControlFlag);
  DUMP_CTXSET(CiipFlag); DUMP_CTXSET(SmvdFlag); DUMP_CTXSET(IBCFlag);
  DUMP_CTXSET(ISPMode); DUMP_CTXSET(JointCbCrFlag);
  {
    uint32_t n = ContextSetCfg::NumberOfContexts;
    dump("numContexts", &n, {1});
  }

  // ---- CABAC engine LUTs (protected statics — expose via subclass) ----
  {
    struct Expose : BinProbModel_Std {
      static const uint8_t* renorm() { return m_RenormTable_32; }
      static const BinFracBits* fracBits() { return m_binFracBits; }
    };
    dump("renormTable32", Expose::renorm(), {32});
    std::vector<int32_t> fb;
    for (int i = 0; i < 256; i++) {
      fb.push_back((int32_t)Expose::fracBits()[i].intBits[0]);
      fb.push_back((int32_t)Expose::fracBits()[i].intBits[1]);
    }
    dump("binFracBits", fb.data(), {256, 2});
  }

  // ---- interpolation filters ----
  dump("lumaFilter",   &InterpolationFilter::m_lumaFilter[0][0],   {LUMA_INTERPOLATION_FILTER_SUB_SAMPLE_POSITIONS, NTAPS_LUMA});
  dump("chromaFilter", &InterpolationFilter::m_chromaFilter[0][0], {CHROMA_INTERPOLATION_FILTER_SUB_SAMPLE_POSITIONS, NTAPS_CHROMA});
  dump("lumaFilterRPR1",   &InterpolationFilter::m_lumaFilterRPR1[0][0],   {LUMA_INTERPOLATION_FILTER_SUB_SAMPLE_POSITIONS, NTAPS_LUMA});
  dump("lumaFilterRPR2",   &InterpolationFilter::m_lumaFilterRPR2[0][0],   {LUMA_INTERPOLATION_FILTER_SUB_SAMPLE_POSITIONS, NTAPS_LUMA});
  dump("chromaFilterRPR1", &InterpolationFilter::m_chromaFilterRPR1[0][0], {CHROMA_INTERPOLATION_FILTER_SUB_SAMPLE_POSITIONS, NTAPS_CHROMA});
  dump("chromaFilterRPR2", &InterpolationFilter::m_chromaFilterRPR2[0][0], {CHROMA_INTERPOLATION_FILTER_SUB_SAMPLE_POSITIONS, NTAPS_CHROMA});

  // ---- ALF fixed filters (protected statics — expose via subclass) ----
  {
    struct AlfExpose : AdaptiveLoopFilter {
      static const int* fixed() { return &m_fixedFilterSetCoeff[0][0]; }
      static const int* mapping() { return &m_classToFilterMapping[0][0]; }
    };
    dump("alfFixedFilterCoeff", AlfExpose::fixed(),
         {ALF_FIXED_FILTER_NUM, MAX_NUM_ALF_LUMA_COEFF});
    dump("alfClassToFilterMapping", AlfExpose::mapping(),
         {NUM_FIXED_FILTER_SETS, MAX_NUM_ALF_CLASSES});
  }

  // ---- misc intra ----
  dump("chroma422IntraAngleMapping", g_chroma422IntraAngleMappingTable, {NUM_INTRA_MODE});

  // ---- inter tables (private members: bind by mangled symbol) ----
  {
    extern const TFilterCoeff lf4x4[16][8] __asm__("_ZN19InterpolationFilter15m_lumaFilter4x4E");
    extern const TFilterCoeff lfAltH[8] __asm__("_ZN19InterpolationFilter20m_lumaAltHpelIFilterE");
    extern const TFilterCoeff bilin4[16][2] __asm__("_ZN19InterpolationFilter21m_bilinearFilterPrec4E");
    dump("lumaFilter4x4", &lf4x4[0][0],
         {LUMA_INTERPOLATION_FILTER_SUB_SAMPLE_POSITIONS, NTAPS_LUMA});
    dump("lumaAltHpelIFilter", &lfAltH[0], {NTAPS_LUMA});
    dump("bilinearFilterPrec4", &bilin4[0][0],
         {LUMA_INTERPOLATION_FILTER_SUB_SAMPLE_POSITIONS, NTAPS_BILINEAR});
  }
  {
    initGeoTemplate();
    // g_GeoParams: [GEO_NUM_PARTITION_MODE][2] = (angleIdx, distanceIdx)
    std::vector<int16_t> gp;
    for (int i = 0; i < GEO_NUM_PARTITION_MODE; i++) {
      gp.push_back(g_GeoParams[i][0]);
      gp.push_back(g_GeoParams[i][1]);
    }
    dump("geoParams", gp.data(), {GEO_NUM_PARTITION_MODE, 2});
    dump("geoWeights0", g_globalGeoWeights[0], {GEO_WEIGHT_MASK_SIZE, GEO_WEIGHT_MASK_SIZE});
    dump("geoWeights1", g_globalGeoWeights[1], {GEO_WEIGHT_MASK_SIZE, GEO_WEIGHT_MASK_SIZE});
    dump("geoWeightOffset", &g_weightOffset[0][0][0][0],
         {GEO_NUM_PARTITION_MODE, GEO_NUM_CU_SIZE, GEO_NUM_CU_SIZE, 2});
    std::vector<int32_t> a2m(GEO_NUM_ANGLES), dis(GEO_NUM_ANGLES), a2mir(GEO_NUM_ANGLES);
    for (int i = 0; i < GEO_NUM_ANGLES; i++) {
      a2m[i] = g_angle2mask[i]; dis[i] = g_Dis[i]; a2mir[i] = g_angle2mirror[i];
    }
    dump("geoAngle2mask", a2m.data(), {GEO_NUM_ANGLES});
    dump("geoDis", dis.data(), {GEO_NUM_ANGLES});
    dump("geoAngle2mirror", a2mir.data(), {GEO_NUM_ANGLES});
  }

  fclose(g_out);
  fprintf(stderr, "rom dump complete\n");
  return 0;
}
