#!/usr/bin/env sh
# MaryTTS-compatible query example (endpoint parity: larynx/server.py /process).
# Usage: scripts/marytts-client.sh "Text to speak" [voice] [host:port] > out.wav
TEXT="${1:?usage: marytts-client.sh TEXT [voice] [host:port]}"
VOICE="${2:-en-us/ljspeech-glow_tts;high}"
HOST="${3:-localhost:5002}"
exec curl -sG "http://$HOST/process" \
  --data-urlencode "INPUT_TEXT=$TEXT" \
  --data-urlencode "INPUT_TYPE=TEXT" \
  --data-urlencode "OUTPUT_TYPE=AUDIO" \
  --data-urlencode "AUDIO=WAVE" \
  --data-urlencode "VOICE=$VOICE"
