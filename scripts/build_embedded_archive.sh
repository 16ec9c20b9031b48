#!/bin/sh
# Package the embedded-profile encoder as a self-contained source drop
# (counterpart of the reference's c/build-archive.sh + tinyimgcodec.sh
# curl-pipe install): produces dist/tic_embedded.c, a single C file that
# builds with any C11 compiler, and dist/tic_embedded.sh, a self-extracting
# installer.
set -e
cd "$(dirname "$0")/.."
mkdir -p dist
SRC=tinyimgcodec_tpu/native/embedded.c
cp "$SRC" dist/tic_embedded.c
{
    echo '#!/bin/sh'
    echo '# self-extracting tinyimgcodec-tpu embedded encoder source'
    echo 'base64 -d <<"EOF" > tic_embedded.c'
    base64 dist/tic_embedded.c
    echo 'EOF'
    echo 'echo "extracted tic_embedded.c"'
    echo 'echo "build the CLI with: cc -O2 -DTIC_EMBEDDED_MAIN -o tic_encode tic_embedded.c"'
} > dist/tic_embedded.sh
chmod +x dist/tic_embedded.sh
echo "wrote dist/tic_embedded.c and dist/tic_embedded.sh"
