// bridge.cpp — C ABI for the compiler core, consumed from Python via
// ctypes (drstencil_tpu/native_bridge.py).  Exposes the analysis pipeline
// and the emitter so the Python IR can be differential-tested against the
// native one, and so the tuner can drive the native emitter in-process.

#include <cstdlib>
#include <cstring>
#include <string>

#include "drstencil.hpp"
#include "emit.hpp"

namespace {

char* dup_string(const std::string& s) {
    char* out = static_cast<char*>(std::malloc(s.size() + 1));
    std::memcpy(out, s.c_str(), s.size() + 1);
    return out;
}

char* error_json(const std::string& msg) {
    std::string esc;
    for (char c : msg) {
        if (c == '"' || c == '\\') esc += '\\';
        if (c == '\n') { esc += "\\n"; continue; }
        esc += c;
    }
    return dup_string(std::string("{\"error\":\"") + esc + "\"}");
}

}  // namespace

extern "C" {

// Analyze .stc text; returns malloc'd JSON (caller frees via drs_free).
char* drs_analyze(const char* stc_text, const char* name, int step,
                  int distance, int merge_forward) {
    try {
        drs::Spec spec = drs::parse_stc(stc_text, name ? name : "stencil");
        drs::Analysis an = drs::analyze(spec, step, distance, merge_forward);
        return dup_string(drs::to_json(an));
    } catch (const std::exception& e) {
        return error_json(e.what());
    }
}

// Emit a specialized Pallas program; returns malloc'd program text.
char* drs_emit(const char* stc_text, const char* name, int step, int distance,
               int merge_forward, int tm, int check, int gold_only,
               const char* dtype, int trapezoid, const char* lane_mode,
               int ch, int shards, int vfuse, int block, int prefetch,
               const char* jfix) {
    try {
        drs::Spec spec = drs::parse_stc(stc_text, name ? name : "stencil");
        if (shards > 0) {
            // shard mode: kernel geometry is the per-shard problem; the
            // emitter reconstructs the global dims as local * shards
            if (spec.dims[0] % shards)
                throw drs::StcError("leading dim not divisible by shards");
            spec.dims[0] /= shards;
        }
        drs::Analysis an = drs::analyze(spec, step, distance, merge_forward);
        drs::EmitConfig cfg;
        cfg.tm = tm;
        cfg.ch = ch;
        cfg.check = check != 0;
        cfg.gold_only = gold_only != 0;
        if (dtype && *dtype) cfg.dtype = dtype;
        cfg.trapezoid = trapezoid != 0;
        if (lane_mode && *lane_mode) cfg.lane_mode = lane_mode;
        cfg.shards = shards;
        cfg.vfuse = vfuse != 0;
        cfg.block = block > 0 ? block : 1;
        if (prefetch > 0 && prefetch != 1 && prefetch != 2)
            throw drs::StcError("prefetch depth must be 1 or 2 (Mosaic "
                                "pipeline limit)");
        cfg.prefetch = prefetch > 0 ? prefetch : 2;
        if (jfix && *jfix) cfg.jfix = jfix;
        return dup_string(drs::emit_program(an, cfg, "(via libdrstencil)"));
    } catch (const std::exception& e) {
        return error_json(e.what());
    }
}

void drs_free(char* p) { std::free(p); }

int drs_abi_version() { return 8; }

}  // extern "C"
