#!/bin/bash
# Encode golden bitstreams with the reference VTM binaries (built under
# /tmp/vtm-src) against the synthetic clips in testdata/.  Each "level" of
# stream enables progressively more coding tools; decode correctness of our
# engine is measured per level (bit-exact vs the recon yuv + hash SEI).
set -e
ENC=/tmp/vtm-src/bin/ninja/gcc-12.2/x86_64/release/EncoderApp
DEC=/tmp/vtm-src/bin/ninja/gcc-12.2/x86_64/release/DecoderApp
CFG=/root/reference/cfg
TD=${1:-testdata}

enc() {
  local name=$1 src=$2 w=$3 h=$4 frames=$5; shift 5
  if [ -f $TD/$name.bit ]; then echo "skip $name"; return; fi
  $ENC -c $CFG/encoder_intra_vtm.cfg --InputFile=$TD/$src \
    --SourceWidth=$w --SourceHeight=$h --FrameRate=30 --FramesToBeEncoded=$frames \
    --BitstreamFile=$TD/$name.bit --ReconFile=$TD/$name.rec.yuv \
    --SEIDecodedPictureHash=1 --IntraPeriod=1 --TemporalSubsampleRatio=1 "$@" > $TD/$name.enc.log
  $DEC -b $TD/$name.bit -o $TD/$name.dec.yuv > $TD/$name.dec.log
  grep -c "OK" $TD/$name.dec.log >/dev/null && echo "golden $name ok"
}

# Level 0: minimal intra toolset — DCT2 only, no secondary tools, no loop
# filters, no dep-quant/sign-hiding. One 64x64 I-frame, then multi-frame.
MINIMAL="--MTS=0 --LFNST=0 --ISP=0 --MIP=0 --MRL=0 --DepQuant=0 --SignHideFlag=0
 --LMChroma=0 --JointCbCr=0 --TransformSkip=0 --BDPCM=0 --ALF=0 --CCALF=0 --SAO=0
 --LMCSEnable=0 --LoopFilterDisable=1 --IBC=0 --SEIDecodedPictureHash=1"

enc ai_min_tiny64_qp37 tiny64_64x64_420_8.yuv 64 64 1 --QP=37 $MINIMAL
enc ai_min_tiny64_qp27 tiny64_64x64_420_8.yuv 64 64 2 --QP=27 $MINIMAL
enc ai_min_small208_qp32 small208_208x120_420_8.yuv 208 120 2 --QP=32 $MINIMAL

# Level 1: + dep-quant & sign hiding (normal entropy path)
enc ai_dq_tiny64_qp32 tiny64_64x64_420_8.yuv 64 64 2 --QP=32 --MTS=0 --LFNST=0 \
  --ISP=0 --MIP=0 --MRL=0 --LMChroma=0 --JointCbCr=0 --TransformSkip=0 --BDPCM=0 \
  --ALF=0 --CCALF=0 --SAO=0 --LMCSEnable=0 --LoopFilterDisable=1 --IBC=0

# Level 2: + MTS/LFNST/ISP/MIP/MRL/CCLM/JointCbCr (full intra toolset, no filters)
enc ai_tools_tiny64_qp32 tiny64_64x64_420_8.yuv 64 64 2 --QP=32 \
  --ALF=0 --CCALF=0 --SAO=0 --LMCSEnable=0 --LoopFilterDisable=1 --IBC=0

# Level 3: full AI CTC config (all loop filters)
enc ai_full_tiny64_qp32 tiny64_64x64_420_8.yuv 64 64 2 --QP=32
enc ai_full_small208_qp37 small208_208x120_420_8.yuv 208 120 2 --QP=37

# ---------------------------------------------------------------------------
# Inter golden streams.  encp = low-delay-P base, encb = low-delay-B base,
# encra = random-access base.
encp() {
  local name=$1 src=$2 w=$3 h=$4 frames=$5; shift 5
  if [ -f $TD/$name.bit ]; then echo "skip $name"; return; fi
  $ENC -c $CFG/encoder_lowdelay_P_vtm.cfg --InputFile=$TD/$src \
    --SourceWidth=$w --SourceHeight=$h --FrameRate=30 --FramesToBeEncoded=$frames \
    --BitstreamFile=$TD/$name.bit --ReconFile=$TD/$name.rec.yuv \
    --SEIDecodedPictureHash=1 --TemporalSubsampleRatio=1 "$@" > $TD/$name.enc.log
  $DEC -b $TD/$name.bit -o $TD/$name.dec.yuv > $TD/$name.dec.log
  grep -c "OK" $TD/$name.dec.log >/dev/null && echo "golden $name ok"
}
encb() {
  local name=$1 src=$2 w=$3 h=$4 frames=$5; shift 5
  if [ -f $TD/$name.bit ]; then echo "skip $name"; return; fi
  $ENC -c $CFG/encoder_lowdelay_vtm.cfg --InputFile=$TD/$src \
    --SourceWidth=$w --SourceHeight=$h --FrameRate=30 --FramesToBeEncoded=$frames \
    --BitstreamFile=$TD/$name.bit --ReconFile=$TD/$name.rec.yuv \
    --SEIDecodedPictureHash=1 --TemporalSubsampleRatio=1 "$@" > $TD/$name.enc.log
  $DEC -b $TD/$name.bit -o $TD/$name.dec.yuv > $TD/$name.dec.log
  grep -c "OK" $TD/$name.dec.log >/dev/null && echo "golden $name ok"
}
encra() {
  local name=$1 src=$2 w=$3 h=$4 frames=$5; shift 5
  if [ -f $TD/$name.bit ]; then echo "skip $name"; return; fi
  $ENC -c $CFG/encoder_randomaccess_vtm.cfg --InputFile=$TD/$src \
    --SourceWidth=$w --SourceHeight=$h --FrameRate=30 --FramesToBeEncoded=$frames \
    --BitstreamFile=$TD/$name.bit --ReconFile=$TD/$name.rec.yuv \
    --SEIDecodedPictureHash=1 --TemporalSubsampleRatio=1 "$@" > $TD/$name.enc.log
  $DEC -b $TD/$name.bit -o $TD/$name.dec.yuv > $TD/$name.dec.log
  grep -c "OK" $TD/$name.dec.log >/dev/null && echo "golden $name ok"
}

# All optional inter tools off (base: translational merge/AMVP + MC + HMVP)
INTER_OFF="--Affine=0 --SubPuMvp=0 --DMVR=0 --BIO=0 --PROF=0 --MMVD=0 --Geo=0
 --CIIP=0 --SMVD=0 --BCW=0 --IMV=0 --SBT=0 --TMVPMode=0 --LMCSEnable=0
 --MCTSEncConstraint=0"

# I0: minimal inter — P slices, no tools, no filters, no dep-quant
encp ld_min_tiny64_qp32 tiny64_64x64_420_8.yuv 64 64 3 --QP=32 $MINIMAL $INTER_OFF
encp ld_min_small208_qp32 small208_208x120_420_8.yuv 208 120 4 --QP=32 $MINIMAL $INTER_OFF

# I1: + dep-quant/sign-hiding + deblocking (inter boundary strengths)
encp ld_db_small208_qp32 small208_208x120_420_8.yuv 208 120 4 --QP=32 \
  --MTS=0 --LFNST=0 --ISP=0 --MIP=0 --MRL=0 --LMChroma=0 --JointCbCr=0 \
  --TransformSkip=0 --BDPCM=0 --ALF=0 --CCALF=0 --SAO=0 --IBC=0 $INTER_OFF

# I2: per-tool streams (each adds one tool group over I1 baseline)
TOOLBASE="--MTS=0 --LFNST=0 --ISP=0 --MIP=0 --MRL=0 --LMChroma=0 --JointCbCr=0
 --TransformSkip=0 --BDPCM=0 --ALF=0 --CCALF=0 --SAO=0 --IBC=0"
encp ld_tmvp_small208_qp32 small208_208x120_420_8.yuv 208 120 4 --QP=32 \
  $TOOLBASE $INTER_OFF --TMVPMode=1
encp ld_imv_small208_qp32 small208_208x120_420_8.yuv 208 120 4 --QP=32 \
  $TOOLBASE --Affine=0 --SubPuMvp=0 --DMVR=0 --BIO=0 --PROF=0 --MMVD=0 --Geo=0 \
  --CIIP=0 --SMVD=0 --BCW=0 --SBT=0 --TMVPMode=1 --LMCSEnable=0 --IMV=1
encp ld_mmvd_small208_qp32 small208_208x120_420_8.yuv 208 120 4 --QP=32 \
  $TOOLBASE --Affine=0 --SubPuMvp=0 --DMVR=0 --BIO=0 --PROF=0 --Geo=0 \
  --CIIP=0 --SMVD=0 --BCW=0 --SBT=0 --TMVPMode=1 --LMCSEnable=0 --IMV=0 --MMVD=1
encp ld_affine_small208_qp32 small208_208x120_420_8.yuv 208 120 4 --QP=32 \
  $TOOLBASE --SubPuMvp=0 --DMVR=0 --BIO=0 --MMVD=0 --Geo=0 \
  --CIIP=0 --SMVD=0 --BCW=0 --SBT=0 --TMVPMode=1 --LMCSEnable=0 --IMV=0 \
  --Affine=1 --AffineType=1 --PROF=1
encp ld_sbtmvp_small208_qp32 small208_208x120_420_8.yuv 208 120 4 --QP=32 \
  $TOOLBASE --Affine=0 --DMVR=0 --BIO=0 --PROF=0 --MMVD=0 --Geo=0 \
  --CIIP=0 --SMVD=0 --BCW=0 --SBT=0 --TMVPMode=1 --LMCSEnable=0 --IMV=0 --SubPuMvp=1
encp ld_sbt_small208_qp32 small208_208x120_420_8.yuv 208 120 4 --QP=32 \
  $TOOLBASE --Affine=0 --SubPuMvp=0 --DMVR=0 --BIO=0 --PROF=0 --MMVD=0 --Geo=0 \
  --CIIP=0 --SMVD=0 --BCW=0 --TMVPMode=1 --LMCSEnable=0 --IMV=0 --SBT=1

# I3: low-delay B minimal (bi-prediction averaging) and B-only tools
encb ldb_min_small208_qp32 small208_208x120_420_8.yuv 208 120 4 --QP=32 \
  $MINIMAL $INTER_OFF
encb ldb_tools_small208_qp32 small208_208x120_420_8.yuv 208 120 4 --QP=32 \
  $TOOLBASE --Affine=0 --SubPuMvp=0 --DMVR=0 --BIO=0 --PROF=0 --MMVD=0 --SBT=0 \
  --TMVPMode=1 --LMCSEnable=0 --IMV=0 --Geo=1 --CIIP=1 --SMVD=1 --BCW=1

# I4: random access — hierarchical B, DMVR/BDOF live here
encra ra_min_small208_qp32 small208_208x120_420_8.yuv 208 120 5 --QP=32 \
  $MINIMAL $INTER_OFF --AffineAmvr=0 --TemporalFilter=0
encra ra_dmvr_small208_qp32 small208_208x120_420_8.yuv 208 120 5 --QP=32 \
  $TOOLBASE --Affine=0 --SubPuMvp=0 --MMVD=0 --Geo=0 --CIIP=0 --SMVD=0 --BCW=0 \
  --SBT=0 --TMVPMode=1 --LMCSEnable=0 --IMV=0 --DMVR=1 --BIO=1 --PROF=0 --AffineAmvr=0 \
  --TemporalFilter=0

# I5: full CTC (all tools, all filters) — the parity target
encb ldb_full_small208_qp32 small208_208x120_420_8.yuv 208 120 4 --QP=32
encra ra_full_small208_qp32 small208_208x120_420_8.yuv 208 120 9 --QP=32 --TemporalFilter=0
encra ra_full_bq416_qp37 bq416_416x240_420_8.yuv 416 240 9 --QP=37 --TemporalFilter=0



# ---------------------------------------------------------------------------
# Structural-parallelism streams: WPP, tiles, multiple slices
enc ai_wpp_small208_qp32 small208_208x120_420_8.yuv 208 120 2 --QP=32 \
  --ALF=0 --CCALF=0 --SAO=0 --LMCSEnable=0 --IBC=0 \
  --WaveFrontSynchro=1 --EntryPointsPresent=1
encp ld_wpp_small208_qp32 small208_208x120_420_8.yuv 208 120 3 --QP=32 \
  $TOOLBASE $INTER_OFF --TMVPMode=1 \
  --WaveFrontSynchro=1 --EntryPointsPresent=1
enc ai_tiles_bq416_qp32 bq416_416x240_420_8.yuv 416 240 2 --QP=32 \
  --ALF=0 --CCALF=0 --SAO=0 --LMCSEnable=0 --IBC=0 \
  --TileColumnWidthArray=2 --TileRowHeightArray=1 --EntryPointsPresent=1
encra ra_wpp_bq416_qp37 bq416_416x240_420_8.yuv 416 240 5 --QP=37 \
  --TemporalFilter=0 --WaveFrontSynchro=1 --EntryPointsPresent=1
echo done
