// drstencil — TPU-native stencil compiler core (C++17, header-only).
//
// The native counterpart of drstencil_tpu/ir/{spec,passes}.py: parses the
// .stc stencil spec, temporally fuses the operator, derives order/distance,
// runs the data-reuse partition and plane-window range analysis.  The same
// pass pipeline as the reference compiler (reference: drstencil.hpp /
// drstencil_2d.hpp, pass order main.cpp:247-249), reimplemented generically
// over dimensionality with strict parsing and error reporting.  The Python
// IR is differential-tested against this via the JSON dump (drs_analyze in
// bridge.cpp); the emitter (emit.hpp) consumes the Analysis.

#pragma once

#include <algorithm>
#include <array>
#include <cmath>
#include <cstdint>
#include <fstream>
#include <map>
#include <set>
#include <sstream>
#include <stdexcept>
#include <string>
#include <vector>

namespace drs {

using Off = std::vector<int>;          // offset tuple, axis 0 = streaming
using Taps = std::map<Off, double>;    // sorted (parity with std::map walk)

struct StcError : std::runtime_error {
    using std::runtime_error::runtime_error;
};

struct Spec {
    std::string name;
    std::vector<long> dims;   // (M,N) or (L,M,N)
    long iterations = -1;
    Taps taps;
    int ndim() const { return static_cast<int>(dims.size()); }
};

inline std::string suggest_key(const std::string& tok) {
    static const char* keys[] = {"L", "M", "N", "iterations", "stencil"};
    const char* best = nullptr;
    double score = 0.0;
    for (const char* k : keys) {
        std::string key(k);
        size_t common = 0;
        for (size_t i = 0; i < std::min(tok.size(), key.size()); ++i)
            if (tok[i] == key[i]) ++common;
        double s = double(common) / std::max(tok.size(), key.size());
        if (s > score) { score = s; best = k; }
    }
    if (best && score >= 0.5)
        return std::string(" (did you mean '") + best + "'?)";
    return "";
}

// Parse .stc text (same grammar as the reference parser,
// drstencil.hpp:52-78, but unknown tokens and missing fields are errors —
// the reference silently leaves e.g. a typo'd 'iterations' uninitialized).
inline Spec parse_stc(const std::string& text_in, const std::string& name) {
    Spec spec;
    spec.name = name;
    // strip '#' comments to end of line
    std::string text;
    text.reserve(text_in.size());
    bool in_comment = false;
    for (char c : text_in) {
        if (c == '#') in_comment = true;
        if (c == '\n') in_comment = false;
        if (!in_comment) text += c;
    }
    std::istringstream in(text);
    std::string tok;
    std::map<std::string, long> sizes;
    bool in_stencil = false;
    while (in >> tok) {
        if (tok == "L" || tok == "M" || tok == "N") {
            long v;
            if (!(in >> v)) throw StcError("expected integer after '" + tok + "'");
            sizes[tok] = v;
        } else if (tok == "iterations") {
            if (!(in >> spec.iterations))
                throw StcError("expected integer after 'iterations'");
        } else if (tok == "stencil") {
            in_stencil = true;
            break;
        } else {
            throw StcError("unknown token '" + tok + "' in " + name + ".stc" +
                           suggest_key(tok));
        }
    }
    if (!sizes.count("M") || !sizes.count("N"))
        throw StcError("missing grid size M/N in " + name + ".stc");
    if (spec.iterations < 0)
        throw StcError("missing 'iterations' in " + name + ".stc");
    if (sizes.count("L")) spec.dims = {sizes["L"], sizes["M"], sizes["N"]};
    else spec.dims = {sizes["M"], sizes["N"]};

    if (in_stencil) {
        const int nd = spec.ndim();
        std::vector<std::string> rest;
        while (in >> tok) rest.push_back(tok);
        if (rest.size() % size_t(nd + 1) != 0)
            throw StcError("stencil table has " + std::to_string(rest.size()) +
                           " tokens, not a multiple of " + std::to_string(nd + 1));
        for (size_t r = 0; r < rest.size(); r += nd + 1) {
            Off off(nd);
            try {
                for (int a = 0; a < nd; ++a) off[a] = std::stoi(rest[r + a]);
                double coe = std::stod(rest[r + nd]);
                if (!std::isfinite(coe)) throw std::invalid_argument("inf");
                spec.taps[off] += coe;
            } catch (const std::logic_error&) {
                throw StcError("bad stencil row near token '" + rest[r] + "'");
            }
        }
    }
    if (spec.taps.empty())
        throw StcError("missing or empty 'stencil' table in " + name + ".stc");
    return spec;
}

inline Spec load_stc(const std::string& path) {
    std::ifstream f(path);
    if (!f) throw StcError("cannot open stencil file: " + path);
    std::ostringstream ss;
    ss << f.rdbuf();
    std::string base = path;
    size_t slash = base.find_last_of('/');
    if (slash != std::string::npos) base = base.substr(slash + 1);
    size_t dot = base.find_last_of('.');
    if (dot != std::string::npos) base = base.substr(0, dot);
    return parse_stc(ss.str(), base);
}

// Operator composition: offsets add, coefficients multiply-accumulate.
// Iterative equivalent of the reference's recursive do_fusing
// (drstencil.hpp:262-276).
inline Taps compose(const Taps& a, const Taps& b) {
    Taps out;
    for (const auto& [oa, ca] : a)
        for (const auto& [ob, cb] : b) {
            Off key(oa.size());
            for (size_t i = 0; i < oa.size(); ++i) key[i] = oa[i] + ob[i];
            out[key] += ca * cb;
        }
    return out;
}

inline Taps fuse(const Taps& taps, int step) {
    if (step < 1) throw StcError("step must be >= 1");
    const int nd = static_cast<int>(taps.begin()->first.size());
    Taps fused{{Off(nd, 0), 1.0}};
    for (int s = 0; s < step; ++s) fused = compose(fused, taps);
    return fused;
}

// Max positive streaming-axis offset (reference order semantics,
// drstencil.hpp:88-98).
inline int order_of(const Taps& taps) {
    int hi = 0;
    for (const auto& [off, _] : taps) hi = std::max(hi, off[0]);
    return hi;
}

// Default reuse distance: (high - low) >> 1 on the streaming axis
// (drstencil.hpp:101-102).
inline int default_distance(const Taps& taps) {
    int hi = 0, lo = 0;
    for (const auto& [off, _] : taps) {
        hi = std::max(hi, off[0]);
        lo = std::min(lo, off[0]);
    }
    return (hi - lo) >> 1;
}

struct Partition {
    std::vector<std::set<Off>> forward;  // per axis; axis 0 = streaming
    std::set<Off> backward;
    int distance = 0;
    int low = 1, high = -1;              // plane-window extent on axis 0
    int window() const { return high - low + 1; }
};

inline Off shifted(const Off& o, int axis, int delta) {
    Off r = o;
    r[axis] += delta;
    return r;
}

// Data-reuse partition (reference algorithm, drstencil.hpp:198-259 /
// drstencil_2d.hpp:180-228, generalized over ndim): axis-a candidates are
// taps whose -distance shift along a is also a tap; axis 0 takes all of
// its candidates, later axes dedup against already-covered targets; the
// rest accumulate backward.  Small non-stream forward sets fold back.
inline Partition partition(const Taps& taps, int distance, int merge_forward) {
    if (distance <= 0) throw StcError("distance must be positive");
    const int nd = static_cast<int>(taps.begin()->first.size());
    Partition part;
    part.distance = distance;
    part.forward.resize(nd);

    std::set<Off> done;
    for (int a = 0; a < nd; ++a) {
        for (const auto& [p, _] : taps) {
            Off target = shifted(p, a, -distance);
            if (!taps.count(target)) continue;
            if (a > 0 && done.count(target)) continue;
            part.forward[a].insert(p);
            done.insert(target);
        }
    }
    for (const auto& [p, _] : taps)
        if (!done.count(p)) part.backward.insert(p);

    if (part.forward[0].empty())
        throw StcError(
            "No data to reuse along the streaming axis at distance " +
            std::to_string(distance) + "; try another dist.");

    for (int a = 1; a < nd; ++a) {
        if (static_cast<int>(part.forward[a].size()) < merge_forward) {
            for (const auto& p : part.forward[a])
                part.backward.insert(shifted(p, a, -distance));
            part.forward[a].clear();
        }
    }

    for (const auto& grp : part.forward)
        for (const auto& p : grp) {
            part.low = std::min(part.low, p[0]);
            part.high = std::max(part.high, p[0]);
        }
    for (const auto& p : part.backward) {
        part.low = std::min(part.low, p[0]);
        part.high = std::max(part.high, p[0]);
    }
    return part;
}

struct Analysis {
    Spec spec;
    int step = 1;
    Taps fused;
    int order = 0;
    int distance = 0;
    Partition part;
    int halo() const { return order; }
};

inline Analysis analyze(const Spec& spec, int step, int distance,
                        int merge_forward) {
    Analysis an;
    an.spec = spec;
    an.step = step;
    an.fused = fuse(spec.taps, step);
    an.order = order_of(an.fused);
    an.distance = distance != 0 ? distance : default_distance(an.fused);
    an.part = partition(an.fused, an.distance, merge_forward);
    return an;
}

// Compact JSON dump of the analysis for differential testing against the
// Python IR (tests/test_native.py).
inline std::string to_json(const Analysis& an) {
    std::ostringstream o;
    o.precision(17);
    auto off_json = [](const Off& p) {
        std::ostringstream s;
        s << "[";
        for (size_t i = 0; i < p.size(); ++i) s << (i ? "," : "") << p[i];
        s << "]";
        return s.str();
    };
    o << "{\"order\":" << an.order << ",\"distance\":" << an.distance
      << ",\"window\":" << an.part.window() << ",\"low\":" << an.part.low
      << ",\"high\":" << an.part.high << ",\"fused\":[";
    bool first = true;
    for (const auto& [p, c] : an.fused) {
        o << (first ? "" : ",") << "[" << off_json(p) << "," << c << "]";
        first = false;
    }
    o << "],\"forward\":[";
    for (size_t a = 0; a < an.part.forward.size(); ++a) {
        o << (a ? "," : "") << "[";
        bool f2 = true;
        for (const auto& p : an.part.forward[a]) {
            o << (f2 ? "" : ",") << off_json(p);
            f2 = false;
        }
        o << "]";
    }
    o << "],\"backward\":[";
    first = true;
    for (const auto& p : an.part.backward) {
        o << (first ? "" : ",") << off_json(p);
        first = false;
    }
    o << "]}";
    return o.str();
}

}  // namespace drs
