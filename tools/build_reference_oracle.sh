#!/usr/bin/env bash
# Build the REAL reference renderer (Maraneshi/MiniRayTracer) as a headless
# Linux oracle binary at /tmp/refbuild/mrt_headless.
#
# The reference cannot build on Linux as shipped (SURVEY.md 9.5): MSVC-only
# lzcnt intrinsic (mrt_math.h:60-69), __cdecl/__stdcall, MSVC anonymous
# structs-in-unions, and MRT_ReportProgress has no Linux definition. This
# script copies the sources to /tmp/refbuild (the reference tree itself is
# never modified), applies those MINIMAL portability patches, adds a
# headless platform stub and a linear-framebuffer dump hook, and compiles
# with g++. The patched copy is a TEST ORACLE only — no reference code is
# ever copied into the framework.
#
# Output protocol: run from a cwd where ../earthmap.jpg and ../obj resolve
# (e.g. /tmp/refbuild/run); when tracing completes the binary writes the
# LINEAR framebuffer (the ground-truth buffer, main.cpp:57-58) as
# width*height Vec3<float32[4]> rows to ./linear_out.bin and exits.
set -euo pipefail

REF=${1:-/root/reference}
OUT=${2:-/tmp/refbuild}

mkdir -p "$OUT" "$OUT/run"
cp "$REF"/*.cpp "$REF"/*.h "$OUT/"
mkdir -p "$OUT/include"
cp "$REF"/include/stb_image.h "$OUT/include/"
rm -f "$OUT"/platform_win32.cpp "$OUT"/platform_linux.cpp

python3 - "$OUT" <<'PYEOF'
import sys

out = sys.argv[1]

# --- mrt_math.h: lzcnt via gcc builtin -----------------------------------
p = f"{out}/mrt_math.h"
s = open(p).read()
s = s.replace("#error INSERT LZCNT INTRINSIC HERE",
              "        unsigned long i = __builtin_clz(v);")
open(p, "w").write(s)

# --- mat4.h / onb.h: flatten MSVC anonymous structs-in-unions ------------
# (gcc forbids members with constructors in anonymous aggregates even under
# -fms-extensions; keep the named Vec4 members, alias the array views)
import re

p = f"{out}/mat4.h"
s = open(p).read()
s = s.replace("""    union {
        struct {
            Vec4 c0, c1, c2, c3;
        };
        Vec4 c[4];
        struct {
            float m00, m10, m20, m30;
            float m01, m11, m21, m31;
            float m02, m12, m22, m32;
            float m03, m13, m23, m33;
        };
    };""",
"""    Vec4 c0, c1, c2, c3;  // flattened union (column array aliased below)""")
# the float-matrix ctor: init columns instead of the flattened float view
s = re.sub(
    r"Mat4\(float m00, float m01, float m02, float m03,\s*"
    r"float m10, float m11, float m12, float m13,\s*"
    r"float m20, float m21, float m22, float m23,\s*"
    r"float m30, float m31, float m32, float m33\) :\s*"
    r"m00\(m00\), m10\(m10\), m20\(m20\), m30\(m30\),\s*"
    r"m01\(m01\), m11\(m11\), m21\(m21\), m31\(m31\),\s*"
    r"m02\(m02\), m12\(m12\), m22\(m22\), m32\(m32\),\s*"
    r"m03\(m03\), m13\(m13\), m23\(m23\), m33\(m33\) \{\}",
    "Mat4(float m00, float m01, float m02, float m03,\n"
    "         float m10, float m11, float m12, float m13,\n"
    "         float m20, float m21, float m22, float m23,\n"
    "         float m30, float m31, float m32, float m33) :\n"
    "        c0(m00, m10, m20, m30), c1(m01, m11, m21, m31),\n"
    "        c2(m02, m12, m22, m32), c3(m03, m13, m23, m33) {}",
    s)
s = re.sub(r"(?<![\w.&])c\[", "(&this->c0)[", s)
open(p, "w").write(s)

p = f"{out}/mat4.cpp"
s = open(p).read()
s = re.sub(r"(?<![\w.&])c\[", "(&this->c0)[", s)
comp = {"0": "x", "1": "y", "2": "z", "3": "w"}
s = re.sub(r"\bm([0-3])([0-3])\b",
           lambda m: f"(&this->c0)[{m.group(2)}].{comp[m.group(1)]}", s)
open(p, "w").write(s)

p = f"{out}/onb.h"
s = open(p).read()
s = s.replace("""    union {
        struct {
            Vec3 u;
            Vec3 v;
            Vec3 w;
        };
        Vec3 axis[3];
    };""",
"""    Vec3 u, v, w;  // flattened union (axis[] view aliased below)""")
s = re.sub(r"(?<![\w.&])axis\[", "(&this->u)[", s)
open(p, "w").write(s)

# --- cmdline_parser.cpp: drop the MSVC-only constexpr specialization trick
p = f"{out}/cmdline_parser.cpp"
s = open(p).read()
s = s.replace(
    "template<>\nconstexpr char* std::numeric_limits<char*>::max() noexcept {",
    "template<>\ninline char* std::numeric_limits<char*>::max() noexcept {")
open(p, "w").write(s)

# --- main.cpp: headless dump hook (fires once tracing hits 100%) ---------
p = f"{out}/main.cpp"
s = open(p).read()
anchor = "            MRT_ReportProgress((uint64_t)pctDone, 100);"
assert anchor in s
s = s.replace(anchor, anchor + """
#ifdef MRT_HEADLESS_DUMP
            if (!isTracing) {
                FILE *hf = fopen("linear_out.bin", "wb");
                fwrite(G_linearBackBuffer, sizeof(Vec3),
                       (size_t)p->bufferWidth * p->bufferHeight, hf);
                fclose(hf);
                G_isRunning = false;
            }
#endif
""")
open(p, "w").write(s)
print("patched")
PYEOF

cat > "$OUT/platform_headless.cpp" <<'CPPEOF'
// Headless Linux implementation of the MRT_* platform surface (platform.h):
// no window, stdout title line, monotonic clock. Test-oracle only.
#include "platform.h"
#include <cassert>
#include <cstdarg>
#include <cstdio>
#include <ctime>
#include <unistd.h>
#include <sys/resource.h>

void MRT_PlatformInit() {}
void MRT_PlatformDestroy() {}
void MRT_HandleMessages() {}
void MRT_CreateWindow(uint32_t, uint32_t, uint32_t, uint32_t) {}
void MRT_SetWindowTitle(const char *str) { fprintf(stderr, "\r%s", str); }
void MRT_DrawToWindow(const uint32_t *) {}
void MRT_ReportProgress(uint64_t, uint64_t) {}

void MRT_DebugPrint(const char *format, ...) {
    va_list args;
    va_start(args, format);
    vfprintf(stderr, format, args);
    va_end(args);
}

void MRT_Assert(bool cond) { assert(cond); (void)cond; }
void MRT_Assert(bool cond, const char *msg) {
    if (!cond) fprintf(stderr, "ASSERT: %s\n", msg);
    assert(cond);
    (void)cond;
}

void MRT_Sleep(uint32_t ms) {
    struct timespec ts = {ms / 1000u, (long)(ms % 1000u) * 1000000L};
    nanosleep(&ts, nullptr);
}

void MRT_LowerThreadPriority() { setpriority(PRIO_PROCESS, 0, 19); }

uint64_t MRT_GetTime() {
    struct timespec ts;
    clock_gettime(CLOCK_MONOTONIC_RAW, &ts);
    return (uint64_t)ts.tv_sec * 1000000000ull + (uint64_t)ts.tv_nsec;
}

float MRT_TimeDelta(uint64_t start, uint64_t stop) {
    return (float)(stop - start) * 1e-9f;
}
CPPEOF

g++ -std=c++20 -O2 -march=native -fms-extensions -fno-exceptions -fno-rtti \
    -D__cdecl= -D__stdcall= -DMRT_HEADLESS_DUMP -pthread -include cstring \
    -I"$OUT" -I"$OUT/include" \
    "$OUT"/main.cpp "$OUT"/scene.cpp "$OUT"/scene_object.cpp \
    "$OUT"/sphere.cpp "$OUT"/rect.cpp "$OUT"/triangle.cpp \
    "$OUT"/volumes.cpp "$OUT"/texture.cpp "$OUT"/pcg.cpp "$OUT"/mat4.cpp \
    "$OUT"/work_queue.cpp "$OUT"/cmdline_parser.cpp "$OUT"/obj_loader.cpp \
    "$OUT"/stb_image.cpp "$OUT"/platform_headless.cpp \
    -o "$OUT/mrt_headless" -lm

echo "built $OUT/mrt_headless"
