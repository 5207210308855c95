// Fast dataset loaders for pypose_tpu (g2o pose graphs, BAL problems).
//
// The reference downloads + parses these in Python at example runtime
// (examples/module/pgo/pgo_dataset.py); production-scale graphs (BAL
// trafalgar: ~65k points, ~225k observations) make Python tokenization the
// bottleneck, so the hot parse loop lives here.  Exposed through a minimal
// C ABI consumed via ctypes (no pybind11 in this environment).
//
// Build: g++ -O2 -shared -fPIC -o libppt_loader.so loader.cpp

#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <cstdint>
#include <vector>
#include <string>

namespace {

struct G2O {
    std::vector<int64_t> vertex_ids;
    std::vector<double> vertices;   // 7 per vertex
    std::vector<int64_t> edges;     // 2 per edge
    std::vector<double> measures;   // 7 per edge
    std::vector<double> infos;      // 21 per edge (upper triangular)
};

struct BAL {
    int64_t n_cams = 0, n_pts = 0, n_obs = 0;
    std::vector<int64_t> cam_idx, pt_idx;
    std::vector<double> pixels;     // 2 per obs
    std::vector<double> cameras;    // 9 per cam
    std::vector<double> points;     // 3 per pt
};

// strtod-based tokenizer over a whole-file buffer: ~20x faster than
// Python str.split + float().
class Scanner {
  public:
    explicit Scanner(const char* path) {
        FILE* f = std::fopen(path, "rb");
        if (!f) return;
        std::fseek(f, 0, SEEK_END);
        long n = std::ftell(f);
        std::fseek(f, 0, SEEK_SET);
        buf_.resize(static_cast<size_t>(n) + 1);
        size_t got = std::fread(buf_.data(), 1, static_cast<size_t>(n), f);
        buf_[got] = '\0';
        std::fclose(f);
        p_ = buf_.data();
        ok_ = true;
    }
    bool ok() const { return ok_; }
    bool next_token(const char** tok, size_t* len) {
        while (*p_ == ' ' || *p_ == '\t' || *p_ == '\r' || *p_ == '\n')
            ++p_;
        if (*p_ == '\0') return false;
        const char* start = p_;
        while (*p_ && *p_ != ' ' && *p_ != '\t' && *p_ != '\r' &&
               *p_ != '\n')
            ++p_;
        *tok = start;
        *len = static_cast<size_t>(p_ - start);
        return true;
    }
    double next_double() {
        char* end = nullptr;
        double v = std::strtod(p_, &end);
        p_ = end;
        return v;
    }
    int64_t next_int() {
        char* end = nullptr;
        long long v = std::strtoll(p_, &end, 10);
        p_ = end;
        return static_cast<int64_t>(v);
    }
    // consume the remainder of the current line (comments / unknown
    // records — real g2o files carry '# ...' comments and extra record
    // types like FIX; skipping token-by-token would mis-parse a comment
    // that itself contains a record keyword)
    void skip_line() {
        while (*p_ && *p_ != '\n') ++p_;
    }

  private:
    std::vector<char> buf_;
    const char* p_ = nullptr;
    bool ok_ = false;
};

G2O* g_g2o = nullptr;
BAL* g_bal = nullptr;

}  // namespace

extern "C" {

// ---- g2o ----------------------------------------------------------------
// Returns 0 on success; sizes written to out params.  Data is fetched by
// the copy functions below and freed with ppt_g2o_free.
int ppt_g2o_parse(const char* path, int64_t* n_vertices, int64_t* n_edges) {
    Scanner sc(path);
    if (!sc.ok()) return -1;
    auto* g = new G2O();
    const char* tok;
    size_t len;
    while (sc.next_token(&tok, &len)) {
        if (len == 15 && std::strncmp(tok, "VERTEX_SE3:QUAT", 15) == 0) {
            g->vertex_ids.push_back(sc.next_int());
            for (int i = 0; i < 7; ++i)
                g->vertices.push_back(sc.next_double());
        } else if (len == 13 && std::strncmp(tok, "EDGE_SE3:QUAT", 13) == 0) {
            g->edges.push_back(sc.next_int());
            g->edges.push_back(sc.next_int());
            for (int i = 0; i < 7; ++i)
                g->measures.push_back(sc.next_double());
            for (int i = 0; i < 21; ++i)
                g->infos.push_back(sc.next_double());
        } else {
            // comment or unknown record type (FIX, VERTEX_SE2, ...):
            // consume the rest of its line
            sc.skip_line();
        }
    }
    delete g_g2o;
    g_g2o = g;
    *n_vertices = static_cast<int64_t>(g->vertex_ids.size());
    *n_edges = static_cast<int64_t>(g->edges.size() / 2);
    return 0;
}

void ppt_g2o_copy(int64_t* vertex_ids, double* vertices, int64_t* edges,
                  double* measures, double* infos) {
    if (!g_g2o) return;
    std::memcpy(vertex_ids, g_g2o->vertex_ids.data(),
                g_g2o->vertex_ids.size() * sizeof(int64_t));
    std::memcpy(vertices, g_g2o->vertices.data(),
                g_g2o->vertices.size() * sizeof(double));
    std::memcpy(edges, g_g2o->edges.data(),
                g_g2o->edges.size() * sizeof(int64_t));
    std::memcpy(measures, g_g2o->measures.data(),
                g_g2o->measures.size() * sizeof(double));
    std::memcpy(infos, g_g2o->infos.data(),
                g_g2o->infos.size() * sizeof(double));
}

void ppt_g2o_free() {
    delete g_g2o;
    g_g2o = nullptr;
}

// ---- BAL ----------------------------------------------------------------
int ppt_bal_parse(const char* path, int64_t* n_cams, int64_t* n_pts,
                  int64_t* n_obs) {
    Scanner sc(path);
    if (!sc.ok()) return -1;
    auto* b = new BAL();
    b->n_cams = sc.next_int();
    b->n_pts = sc.next_int();
    b->n_obs = sc.next_int();
    b->cam_idx.reserve(b->n_obs);
    b->pt_idx.reserve(b->n_obs);
    b->pixels.reserve(2 * b->n_obs);
    for (int64_t i = 0; i < b->n_obs; ++i) {
        b->cam_idx.push_back(sc.next_int());
        b->pt_idx.push_back(sc.next_int());
        b->pixels.push_back(sc.next_double());
        b->pixels.push_back(sc.next_double());
    }
    b->cameras.reserve(9 * b->n_cams);
    for (int64_t i = 0; i < 9 * b->n_cams; ++i)
        b->cameras.push_back(sc.next_double());
    b->points.reserve(3 * b->n_pts);
    for (int64_t i = 0; i < 3 * b->n_pts; ++i)
        b->points.push_back(sc.next_double());
    delete g_bal;
    g_bal = b;
    *n_cams = b->n_cams;
    *n_pts = b->n_pts;
    *n_obs = b->n_obs;
    return 0;
}

void ppt_bal_copy(int64_t* cam_idx, int64_t* pt_idx, double* pixels,
                  double* cameras, double* points) {
    if (!g_bal) return;
    std::memcpy(cam_idx, g_bal->cam_idx.data(),
                g_bal->cam_idx.size() * sizeof(int64_t));
    std::memcpy(pt_idx, g_bal->pt_idx.data(),
                g_bal->pt_idx.size() * sizeof(int64_t));
    std::memcpy(pixels, g_bal->pixels.data(),
                g_bal->pixels.size() * sizeof(double));
    std::memcpy(cameras, g_bal->cameras.data(),
                g_bal->cameras.size() * sizeof(double));
    std::memcpy(points, g_bal->points.data(),
                g_bal->points.size() * sizeof(double));
}

void ppt_bal_free() {
    delete g_bal;
    g_bal = nullptr;
}

}  // extern "C"
