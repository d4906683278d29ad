#!/bin/sh
# End-to-end live demo against the HTTP server (wire-compatible with smelter):
# MP4 loop input -> tiled scene -> HLS output, with a scheduled scene update.
set -e
HOST=http://127.0.0.1:${SMELTER_API_PORT:-8081}
SRC=${1:?usage: live_server_demo.sh source.mp4 [outdir]}
OUT=${2:-/tmp/smelter_hls}
mkdir -p "$OUT"

curl -sf -X POST $HOST/api/input/cam/register \
  -d "{\"type\":\"mp4\",\"path\":\"$SRC\",\"loop\":true}" > /dev/null
curl -sf -X POST $HOST/api/output/live/register -d "{
  \"type\":\"hls\",\"path\":\"$OUT/index.m3u8\",
  \"video\":{\"resolution\":{\"width\":1280,\"height\":720},
    \"encoder\":{\"type\":\"ffmpeg_h264\",\"preset\":\"veryfast\"},
    \"initial\":{\"root\":{\"type\":\"rescaler\",
      \"child\":{\"type\":\"input_stream\",\"input_id\":\"cam\"}}}}}" > /dev/null
# schedule a picture-in-picture style update 5 seconds in
curl -sf -X POST $HOST/api/output/live/update -d '{
  "schedule_time_ms": 5000,
  "video": {"root": {"type": "view", "background_color": "#101020FF",
    "children": [
      {"type": "rescaler", "child": {"type": "input_stream", "input_id": "cam"}},
      {"type": "text", "text": "LIVE", "font_size": 40.0, "color": "#FF3030FF"}
    ]}}}' > /dev/null
curl -sf -X POST $HOST/api/start > /dev/null
echo "streaming to $OUT/index.m3u8 — watch $HOST/stats"
