#!/bin/bash
# Download a (possibly large) file from Google Drive and unpack it.
# Usage: download_from_google_drive.sh <share-url> [<outdir>] [<ext>]
# Same interface as the reference helper
# (wavenet_vocoder/utils/download_from_google_drive.sh): handles the
# virus-scan confirmation page for large files.

share_url=$1
dir=${2:-downloads}
ext=${3:-tar.gz}

if [ -z "$share_url" ]; then
    echo "usage: $0 <share-url> [<outdir>] [<ext: tar.gz|zip|...>]" 1>&2
    exit 1
fi

mkdir -p "$dir"
tmp=$(mktemp "${dir}/XXXXXX.${ext}")

# extract the file id from .../open?id=<ID> or .../file/d/<ID>/...
file_id=$(echo "$share_url" | sed -E 's/.*(id=|\/d\/)([a-zA-Z0-9_-]+).*/\2/')

# first request sets the confirmation cookie for big files
cookie=$(mktemp)
curl -sc "$cookie" "https://drive.google.com/uc?export=download&id=${file_id}" > /dev/null
confirm=$(awk '/download/ {print $NF}' "$cookie" | tail -1)
curl -Lb "$cookie" \
    "https://drive.google.com/uc?export=download&confirm=${confirm}&id=${file_id}" \
    -o "$tmp"
rm -f "$cookie"

case "$ext" in
    tar.gz|tgz) tar xzf "$tmp" -C "$dir" ;;
    tar.bz2)    tar xjf "$tmp" -C "$dir" ;;
    tar)        tar xf  "$tmp" -C "$dir" ;;
    zip)        unzip -o "$tmp" -d "$dir" ;;
    *)          echo "unhandled extension: $ext (file kept at $tmp)"; exit 0 ;;
esac
rm -f "$tmp"
echo "successfully downloaded and unpacked into $dir"
