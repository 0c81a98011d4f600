// BSDS-style boundary pixel correspondence + morphological thinning.
//
// TPU-native framework's C++ equivalent of the reference's external
// `bsds_metric.bsds.{thin, correspond_pixels}` dependency
// (eval_depth_edges.py:7,45,125-131).  The metric needs, per image:
//   * a maximum-cardinality matching between predicted and GT boundary
//     pixels restricted to pairs within maxDist * image-diagonal
//     (the classic BSDS benchmark solves a min-cost assignment with an
//     outlier cost 100x any edge cost, whose optimum is exactly a
//     max-cardinality matching on the distance-bounded graph; precision/
//     recall only consume the match COUNTS, which every max-cardinality
//     matching shares), and
//   * Zhang-Suen binary thinning (used when apply_thinning=true; the
//     heavy-eval path runs with thinning off, eval_depth_edges.py:213-215).
//
// Exposed as a C ABI for ctypes (no pybind11 in this image).
//
// Matching: Hopcroft-Karp, O(E * sqrt(V)), with grid-bucketed candidate
// generation so E stays ~#pixels * (pi r^2) for the small BSDS radius.

#include <cmath>
#include <cstdint>
#include <cstring>
#include <queue>
#include <vector>

namespace {

struct HopcroftKarp {
  int nl, nr;
  const std::vector<std::vector<int>>& adj;  // left -> right candidates
  std::vector<int> match_l, match_r, dist;

  explicit HopcroftKarp(int nl_, int nr_,
                        const std::vector<std::vector<int>>& adj_)
      : nl(nl_), nr(nr_), adj(adj_), match_l(nl_, -1), match_r(nr_, -1),
        dist(nl_, 0) {}

  bool bfs() {
    std::queue<int> q;
    bool found = false;
    for (int u = 0; u < nl; ++u) {
      if (match_l[u] < 0) {
        dist[u] = 0;
        q.push(u);
      } else {
        dist[u] = -1;
      }
    }
    while (!q.empty()) {
      int u = q.front();
      q.pop();
      for (int v : adj[u]) {
        int w = match_r[v];
        if (w < 0) {
          found = true;
        } else if (dist[w] < 0) {
          dist[w] = dist[u] + 1;
          q.push(w);
        }
      }
    }
    return found;
  }

  bool dfs(int u) {
    for (int v : adj[u]) {
      int w = match_r[v];
      if (w < 0 || (dist[w] == dist[u] + 1 && dfs(w))) {
        match_l[u] = v;
        match_r[v] = u;
        return true;
      }
    }
    dist[u] = -1;
    return false;
  }

  int run() {
    int matching = 0;
    while (bfs()) {
      for (int u = 0; u < nl; ++u) {
        if (match_l[u] < 0 && dfs(u)) ++matching;
      }
    }
    return matching;
  }
};

}  // namespace

extern "C" {

// pred, gt: row-major uint8 binary maps [h, w].
// match1, match2: output uint8 maps — 1 where the pixel found a partner.
// Returns the number of matched pairs.
int correspond_pixels(const uint8_t* pred, const uint8_t* gt, int h, int w,
                      double max_dist, uint8_t* match1, uint8_t* match2) {
  const double idiag = std::sqrt(double(h) * h + double(w) * w);
  const double r = max_dist * idiag;
  const double r2 = r * r;
  const int ri = int(std::ceil(r));

  std::vector<int> pred_px, gt_px;
  pred_px.reserve(1024);
  gt_px.reserve(1024);
  for (int i = 0; i < h * w; ++i) {
    if (pred[i]) pred_px.push_back(i);
    if (gt[i]) gt_px.push_back(i);
  }
  std::memset(match1, 0, size_t(h) * w);
  std::memset(match2, 0, size_t(h) * w);
  if (pred_px.empty() || gt_px.empty()) return 0;

  // bucket gt pixels by pixel location for radius lookups
  std::vector<int> gt_id(size_t(h) * w, -1);
  for (size_t k = 0; k < gt_px.size(); ++k) gt_id[gt_px[k]] = int(k);

  std::vector<std::vector<int>> adj(pred_px.size());
  for (size_t k = 0; k < pred_px.size(); ++k) {
    const int y = pred_px[k] / w, x = pred_px[k] % w;
    auto& nbrs = adj[k];
    for (int dy = -ri; dy <= ri; ++dy) {
      const int yy = y + dy;
      if (yy < 0 || yy >= h) continue;
      for (int dx = -ri; dx <= ri; ++dx) {
        const int xx = x + dx;
        if (xx < 0 || xx >= w) continue;
        if (double(dy) * dy + double(dx) * dx > r2) continue;
        const int id = gt_id[yy * w + xx];
        if (id >= 0) nbrs.push_back(id);
      }
    }
  }

  HopcroftKarp hk(int(pred_px.size()), int(gt_px.size()), adj);
  const int n_match = hk.run();
  for (size_t k = 0; k < pred_px.size(); ++k)
    if (hk.match_l[k] >= 0) match1[pred_px[k]] = 1;
  for (size_t k = 0; k < gt_px.size(); ++k)
    if (hk.match_r[k] >= 0) match2[gt_px[k]] = 1;
  return n_match;
}

// Zhang-Suen binary thinning, in place on a uint8 [h, w] map.
void binary_thin(uint8_t* img, int h, int w) {
  auto at = [&](int y, int x) -> uint8_t {
    if (y < 0 || y >= h || x < 0 || x >= w) return 0;
    return img[y * w + x];
  };
  std::vector<int> kill;
  auto subiter = [&](int phase) -> bool {
    kill.clear();
    for (int y = 0; y < h; ++y) {
      for (int x = 0; x < w; ++x) {
        if (!at(y, x)) continue;
        const uint8_t p2 = at(y - 1, x), p3 = at(y - 1, x + 1);
        const uint8_t p4 = at(y, x + 1), p5 = at(y + 1, x + 1);
        const uint8_t p6 = at(y + 1, x), p7 = at(y + 1, x - 1);
        const uint8_t p8 = at(y, x - 1), p9 = at(y - 1, x - 1);
        const int b = p2 + p3 + p4 + p5 + p6 + p7 + p8 + p9;
        if (b < 2 || b > 6) continue;
        const int a = (p2 == 0 && p3) + (p3 == 0 && p4) + (p4 == 0 && p5) +
                      (p5 == 0 && p6) + (p6 == 0 && p7) + (p7 == 0 && p8) +
                      (p8 == 0 && p9) + (p9 == 0 && p2);
        if (a != 1) continue;
        if (phase == 0) {
          if (p2 * p4 * p6 != 0 || p4 * p6 * p8 != 0) continue;
        } else {
          if (p2 * p4 * p8 != 0 || p2 * p6 * p8 != 0) continue;
        }
        kill.push_back(y * w + x);
      }
    }
    for (int idx : kill) img[idx] = 0;
    return !kill.empty();
  };
  bool changed = true;
  while (changed) {
    changed = subiter(0);
    changed = subiter(1) || changed;
  }
}

}  // extern "C"
