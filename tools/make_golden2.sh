#!/bin/bash
# Golden streams, part 2: screen content (IBC/PLT), 10-bit, scaling lists.
# Reference binaries at /tmp/vtm-bin (see tools/make_golden.sh for part 1).
set -e
ENC=${ENC:-/tmp/vtm-bin/EncoderApp}
DEC=${DEC:-/tmp/vtm-bin/DecoderApp}
CFG=/root/reference/cfg
TD=${1:-testdata}

enc() {
  local name=$1 cfg=$2 src=$3 w=$4 h=$5 frames=$6; shift 6
  if [ -f $TD/$name.bit ]; then echo "skip $name"; return; fi
  $ENC -c $CFG/$cfg --InputFile=$TD/$src \
    --SourceWidth=$w --SourceHeight=$h --FrameRate=30 --FramesToBeEncoded=$frames \
    --BitstreamFile=$TD/$name.bit --ReconFile=$TD/$name.rec.yuv \
    --SEIDecodedPictureHash=1 --TemporalSubsampleRatio=1 "$@" > $TD/$name.enc.log
  $DEC -b $TD/$name.bit -o $TD/$name.dec.yuv > $TD/$name.dec.log
  grep -c "OK" $TD/$name.dec.log >/dev/null && echo "golden $name ok"
}

SCC=screen208_208x120_420_8.yuv
NOFILT="--ALF=0 --CCALF=0 --SAO=0 --LMCSEnable=0 --LoopFilterDisable=1"

# IBC only, no filters (isolate the tool)
enc sc_ibc_ai_qp27 encoder_intra_vtm.cfg $SCC 208 120 2 --QP=27 --IntraPeriod=1 \
  --IBC=1 --PLT=0 --HashME=1 $NOFILT
# IBC with all filters + full intra toolset
enc sc_ibc_full_ai_qp32 encoder_intra_vtm.cfg $SCC 208 120 2 --QP=32 --IntraPeriod=1 \
  --IBC=1 --PLT=0 --HashME=1
# PLT only
enc sc_plt_ai_qp27 encoder_intra_vtm.cfg $SCC 208 120 2 --QP=27 --IntraPeriod=1 \
  --IBC=0 --PLT=1 $NOFILT
# IBC + PLT together, full
enc sc_ibcplt_ai_qp32 encoder_intra_vtm.cfg $SCC 208 120 2 --QP=32 --IntraPeriod=1 \
  --IBC=1 --PLT=1 --HashME=1
# IBC in inter (LD-B) — IBC merge/HMVP interplay with inter modes
enc sc_ibc_ldb_qp32 encoder_lowdelay_vtm.cfg $SCC 208 120 4 --QP=32 \
  --IBC=1 --PLT=1 --HashME=1

# 10-bit internal (the CTC operating depth), 8-bit source
enc ai10_small208_qp32 encoder_intra_vtm.cfg small208_208x120_420_8.yuv 208 120 2 \
  --QP=32 --IntraPeriod=1 --InternalBitDepth=10
enc ra10_small208_qp32 encoder_randomaccess_vtm.cfg small208_208x120_420_8.yuv 208 120 9 \
  --QP=32 --InternalBitDepth=10 --TemporalFilter=0
# native 10-bit source
enc ai10src_small208_qp27 encoder_intra_vtm.cfg small208_208x120_420_10.yuv 208 120 2 \
  --QP=27 --IntraPeriod=1 --InternalBitDepth=10 --InputBitDepth=10 --OutputBitDepth=10

# explicit scaling lists
enc ai_sclist_small208_qp32 encoder_intra_vtm.cfg small208_208x120_420_8.yuv 208 120 2 \
  --QP=32 --IntraPeriod=1 --ScalingList=1

# CUSTOM scaling lists via APS (scaling_list_data parse + non-flat dequant)
cp /root/reference/cfg/scaling_list/sample_scaling_list_file.txt /tmp/sclist.txt
enc ai_sclaps_small208_qp32 encoder_intra_vtm.cfg small208_208x120_420_8.yuv 208 120 2 \
  --QP=32 --IntraPeriod=1 --ScalingList=2 --ScalingListFile=/tmp/sclist.txt

# multi-slice picture: 2x2 tiles (128-CTU units), 3 raster-scan slices,
# standalone PH NAL
cat > /tmp/slices3.cfg <<'SLC'
EnablePicPartitioning         : 1
TileColumnWidthArray          : 2
TileRowHeightArray            : 1
RasterScanSlices              : 1
RasterSliceSizes              : 1 2
DisableLoopFilterAcrossTiles  : 0
DisableLoopFilterAcrossSlices : 0
SLC
enc ai_slices_bq416_qp32 encoder_intra_vtm.cfg bq416_416x240_420_8.yuv 416 240 2 \
  --QP=32 --IntraPeriod=1 -c /tmp/slices3.cfg

# 4:2:2 chroma format
enc ai422_small208_qp32 encoder_intra_vtm.cfg small208_208x120_422_8.yuv 208 120 2 \
  --QP=32 --IntraPeriod=1 --InputChromaFormat=422 --ChromaFormatIDC=422

# 1080p AI point (bench / BD-rate ladder at the north-star resolution)
enc ai_full_hd1080_qp37 encoder_intra_vtm.cfg hd1080_1920x1080_420_8.yuv 1920 1080 2 \
  --QP=37 --IntraPeriod=1

# luma-correlated chroma clip: reference encoder engages CC-ALF CTBs
enc ai_ccalf_cc208_qp32 encoder_intra_vtm.cfg cc208_208x120_420_8.yuv 208 120 2 \
  --QP=32 --IntraPeriod=1
echo done
