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

echo done
