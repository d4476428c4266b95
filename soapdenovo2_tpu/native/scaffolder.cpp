// Native scaffold-ordering core: one rank of the contig-ordering pipeline.
//
// C++ counterpart of models/scaffold.py Scaffolder.add_rank (itself the
// TPU-framework redesign of the reference's orderContig.c ordering:2351 —
// downSlide -> deleteWeakCnt -> removeTransitive -> general_linearization
// -> maskPuzzle -> freezing).  The decision logic is identical to the
// Python implementation statement for statement (parity-tested); this
// exists because the reference's scaffolder is native C for a reason —
// at human-genome contig counts the per-rank link graph has millions of
// entries and a Python dict loop becomes the pipeline bottleneck.
//
// Interface: plain C ABI over flat arrays (ctypes; no pybind11 in the
// image).  Chain state ping-pongs host-side between ranks.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <map>
#include <set>
#include <unordered_map>
#include <unordered_set>
#include <vector>

namespace {

using std::int64_t;
using std::uint64_t;
using std::uint8_t;

constexpr int64_t SPLICE_BASE = -(1LL << 20);

inline int64_t gap_span(int64_t g) {
  if (g <= SPLICE_BASE) return -(SPLICE_BASE - g);  // spliced exact overlap
  return g > 1 ? g : 1;
}

inline uint64_t key2(int64_t a, int64_t b) {
  return (static_cast<uint64_t>(a) << 32) | static_cast<uint64_t>(b);
}

struct LinkVal {
  double w;
  int64_t g;
};

// linkset ordered by key => iteration order == Python's sorted() order
using LinkSet = std::map<uint64_t, LinkVal>;

struct Ctx {
  int64_t n_dir;
  const int64_t* ctg_len;
  uint8_t* mask;          // per directed ctg, in/out
  const double* cvg;      // may be null
  uint8_t* bubble_flag;   // per directed ctg, in/out
  // chains
  int64_t n_chains;
  const int64_t* chain_ptr;
  const int64_t* chain_ctgs;
  const int64_t* chain_gaps;  // chain i gaps at [ptr[i]-i, ptr[i+1]-(i+1))
  // params
  int64_t insert_size;
  int64_t k;  // assembly k: arc-adjacent contigs overlap by k bases
  double cvg4snp;
  int snp_enabled;
  const uint64_t* head_sig;  // per directed ctg (0 when unavailable)
  const uint64_t* tail_sig;
  // outputs
  int64_t* snp_pairs;  // 2*n_dir capacity
  int64_t n_snp;
  int64_t n_masked_puzzle;
  int64_t n_linearized;

  std::vector<int64_t> chain_total;  // per chain

  int64_t chain_len_of(int64_t node) const { return chain_total[node >> 1]; }

  // small-insert link history (scaffold.py ctg_links by_small records):
  // sorted (tail_ctg << 32 | head_ctg) keys; the :7074 arbitration's
  // dh_cnt->bySmall consult on long ranks after a short rank
  int64_t n_small = 0;
  const uint64_t* small_keys = nullptr;

  int64_t node_head_ctg(int64_t node) const {
    int64_t ch = node >> 1;
    int64_t b = chain_ptr[ch], e = chain_ptr[ch + 1];
    if (e <= b) return -1;
    return (node & 1) ? (chain_ctgs[e - 1] ^ 1) : chain_ctgs[b];
  }
  int64_t node_tail_ctg(int64_t node) const {
    int64_t ch = node >> 1;
    int64_t b = chain_ptr[ch], e = chain_ptr[ch + 1];
    if (e <= b) return -1;
    return (node & 1) ? (chain_ctgs[b] ^ 1) : chain_ctgs[e - 1];
  }
  bool rev_small(int64_t y, int64_t x) const {
    if (!n_small) return false;
    int64_t cy = node_tail_ctg(y), cx = node_head_ctg(x);
    if (cy < 0 || cx < 0) return false;
    uint64_t key = (static_cast<uint64_t>(cy) << 32) |
                   static_cast<uint32_t>(cx);
    return std::binary_search(small_keys, small_keys + n_small, key);
  }

  int64_t n_chain_ctgs(int64_t ch) const {
    return chain_ptr[ch + 1] - chain_ptr[ch];
  }

  // directed contig id for an oriented singleton chain, else -1
  int64_t single_ctg(int64_t node) const {
    int64_t ch = node >> 1;
    if (n_chain_ctgs(ch) != 1) return -1;
    int64_t c = chain_ctgs[chain_ptr[ch]];
    return c ^ (node & 1);
  }
};

// --- transferCnt2RemainNode (scaffold.py _transfer_links) -----------------
void transfer_links(Ctx& ctx, int64_t lose, int64_t keep, LinkSet& ls) {
  std::vector<uint64_t> hit;
  for (auto& kv : ls) {
    int64_t a = static_cast<int64_t>(kv.first >> 32);
    int64_t b = static_cast<int64_t>(kv.first & 0xFFFFFFFFu);
    if (a == lose || b == lose || a == (lose ^ 1) || b == (lose ^ 1))
      hit.push_back(kv.first);
  }
  // std::map iteration is key-sorted == the Python side's sorted() loop
  for (uint64_t kp : hit) {
    auto it = ls.find(kp);
    if (it == ls.end()) continue;
    LinkVal v = it->second;
    ls.erase(it);
    int64_t a = static_cast<int64_t>(kp >> 32);
    int64_t b = static_cast<int64_t>(kp & 0xFFFFFFFFu);
    int64_t na = a == lose ? keep : (a == (lose ^ 1) ? (keep ^ 1) : a);
    int64_t nb = b == lose ? keep : (b == (lose ^ 1) ? (keep ^ 1) : b);
    if ((na >> 1) == (nb >> 1)) continue;
    auto old = ls.find(key2(na, nb));
    if (old != ls.end())
      old->second.w += v.w;  // keep existing gap
    else
      ls[key2(na, nb)] = v;
  }
}

// --- removeBubbleCtg (scaffold.py _remove_bubble_ctg) ---------------------
// order: (node, pos) pairs sorted by (pos, node); returns collapsed order.
std::vector<std::pair<int64_t, int64_t>> remove_bubble_ctg(
    Ctx& ctx, const std::vector<std::pair<int64_t, int64_t>>& order,
    LinkSet& ls) {
  std::vector<std::pair<int64_t, int64_t>> out;
  int64_t cur = order[0].first, pcur = order[0].second;
  for (size_t i = 1; i < order.size(); ++i) {
    int64_t nxt = order[i].first, pnxt = order[i].second;
    int64_t gap = pnxt - pcur - ctx.chain_len_of(cur);
    if (gap >= 0 || ls.count(key2(cur, nxt)) || ls.count(key2(nxt, cur))) {
      out.emplace_back(cur, pcur);
      cur = nxt;
      pcur = pnxt;
      continue;
    }
    int64_t ca = ctx.single_ctg(cur);
    int64_t cb = ctx.single_ctg(nxt);
    if (ca < 0 || cb < 0 || ctx.cvg == nullptr ||
        ctx.cvg[ca] >= ctx.cvg4snp || ctx.cvg[cb] >= ctx.cvg4snp) {
      out.emplace_back(cur, pcur);
      cur = nxt;
      pcur = pnxt;
      continue;
    }
    int64_t la = ctx.ctg_len[ca], lb = ctx.ctg_len[cb];
    // first/last k-mer equality via precomputed sequence signatures
    if (ctx.head_sig == nullptr || ctx.head_sig[ca] == 0 ||
        ctx.head_sig[cb] == 0 || ctx.head_sig[ca] != ctx.head_sig[cb] ||
        ctx.tail_sig[ca] != ctx.tail_sig[cb]) {
      out.emplace_back(cur, pcur);
      cur = nxt;
      pcur = pnxt;
      continue;
    }
    bool keep_cur =
        ctx.cvg[ca] > ctx.cvg[cb] || (ctx.cvg[ca] == ctx.cvg[cb] && la > lb);
    int64_t keep_n = keep_cur ? cur : nxt;
    int64_t lose_n = keep_cur ? nxt : cur;
    int64_t keep_c = keep_cur ? ca : cb;
    int64_t lose_c = keep_cur ? cb : ca;
    if (!(ctx.bubble_flag[keep_c] && ctx.bubble_flag[lose_c])) {
      ctx.bubble_flag[keep_c] = ctx.bubble_flag[keep_c ^ 1] = 1;
      ctx.bubble_flag[lose_c] = ctx.bubble_flag[lose_c ^ 1] = 1;
      ctx.snp_pairs[2 * ctx.n_snp] = keep_c;
      ctx.snp_pairs[2 * ctx.n_snp + 1] = lose_c;
      ctx.n_snp++;
    }
    transfer_links(ctx, lose_n, keep_n, ls);
    ctx.mask[lose_c] = ctx.mask[lose_c ^ 1] = 1;
    if (!keep_cur) {
      cur = nxt;
      pcur = pnxt;
    }
  }
  out.emplace_back(cur, pcur);
  return out;
}

// --- general_linearization (scaffold.py _general_linearization) -----------
void general_linearization(Ctx& ctx, LinkSet& ls, int64_t ins_var,
                           double overlap_tol, double confl_tol, bool snp,
                           bool by_small, int64_t max_nodes = 32) {
  struct Edge {
    int64_t other;
    double w;
    int64_t g;
  };
  std::unordered_map<int64_t, std::vector<Edge>> outs, ins;
  for (auto& kv : ls) {  // key-sorted: matches linkset insertion semantics
    int64_t a = static_cast<int64_t>(kv.first >> 32);
    int64_t b = static_cast<int64_t>(kv.first & 0xFFFFFFFFu);
    outs[a].push_back({b, kv.second.w, kv.second.g});
    ins[b].push_back({a, kv.second.w, kv.second.g});
  }
  std::unordered_set<int64_t> consumed;
  std::vector<int64_t> starts;
  starts.reserve(outs.size());
  for (auto& kv : outs) starts.push_back(kv.first);
  std::sort(starts.begin(), starts.end());

  // subgraphs are bounded by insert-size DISTANCE from a's ends like the
  // reference's pickUpGeneralSubgraph (orderContig.c:6464): out-of-window
  // neighbours are skipped, not failures (scaffold.py keeps the same rule)
  const int64_t window = ctx.insert_size + 3 * ins_var;
  for (int64_t a : starts) {
    if (consumed.count(a)) continue;
    auto oit = outs.find(a);
    if (oit == outs.end() || oit->second.size() < 2) continue;
    const int64_t a_len = ctx.chain_len_of(a);
    // relaxation DFS in both directions (queue.pop() == pop_back)
    std::unordered_map<int64_t, int64_t> pos;
    pos[a] = 0;
    std::vector<int64_t> queue{a};
    bool ok = true;
    while (!queue.empty() && ok) {
      int64_t cur = queue.back();
      queue.pop_back();
      auto down = outs.find(cur);
      if (down != outs.end()) {
        for (auto& e : down->second) {
          int64_t p = pos[cur] + ctx.chain_len_of(cur) + e.g;
          auto pit = pos.find(e.other);
          if (pit != pos.end()) {
            if (std::llabs(pit->second - p) >
                3 * ins_var + 0.1 * std::llabs(p)) {
              ok = false;
              break;
            }
          } else {
            if (p - a_len > window) continue;  // beyond the insert window
            if (static_cast<int64_t>(pos.size()) >= max_nodes) {
              ok = false;
              break;
            }
            pos[e.other] = p;
            queue.push_back(e.other);
          }
        }
      }
      if (!ok) break;
      auto up = ins.find(cur);
      if (up != ins.end()) {
        for (auto& e : up->second) {
          int64_t p = pos[cur] - e.g - ctx.chain_len_of(e.other);
          auto pit = pos.find(e.other);
          if (pit != pos.end()) {
            if (std::llabs(pit->second - p) >
                3 * ins_var + 0.1 * std::llabs(p)) {
              ok = false;
              break;
            }
          } else {
            if (-(p + ctx.chain_len_of(e.other)) > window)
              continue;  // beyond the insert window
            if (static_cast<int64_t>(pos.size()) >= max_nodes) {
              ok = false;
              break;
            }
            pos[e.other] = p;
            queue.push_back(e.other);
          }
        }
      }
    }
    if (!ok || pos.size() < 3) continue;
    // checkEligible: no member together with its reverse complement
    bool eligible = true;
    for (auto& kv : pos)
      if (pos.count(kv.first ^ 1)) {
        eligible = false;
        break;
      }
    if (!eligible) continue;
    std::vector<std::pair<int64_t, int64_t>> order;  // (node, pos)
    order.reserve(pos.size());
    for (auto& kv : pos) order.emplace_back(kv.first, kv.second);
    std::sort(order.begin(), order.end(),
              [](const std::pair<int64_t, int64_t>& x,
                 const std::pair<int64_t, int64_t>& y) {
                if (x.second != y.second) return x.second < y.second;
                return x.first < y.first;
              });
    if (snp && order.size() >= 2) order = remove_bubble_ctg(ctx, order, ls);
    // checkOverlapInBetween_general (orderContig.c:7495): AGGREGATE
    // overlap budget — a pair's overlap is excused when a direct
    // connection predicted it (cnt->gapLen > gap) or it is under one
    // k-mer (+ins_var in our full-length coordinates); the excess
    // accumulates and fails only past tolerance x total length
    {
      int64_t len_sum = 0;
      for (auto& o : order) len_sum += ctx.chain_len_of(o.first);
      int64_t len_olp = 0;
      ok = len_sum >= 1;
      for (size_t i = 0; ok && i + 1 < order.size(); ++i) {
        int64_t x = order[i].first, px = order[i].second;
        int64_t y = order[i + 1].first, py = order[i + 1].second;
        int64_t overlap = px + ctx.chain_len_of(x) - py;
        if (overlap > 0) {
          uint64_t kxy = (static_cast<uint64_t>(x) << 32) |
                         static_cast<uint32_t>(y);
          uint64_t kyx = (static_cast<uint64_t>(y) << 32) |
                         static_cast<uint32_t>(x);
          auto it = ls.find(kxy);
          if (it == ls.end()) it = ls.find(kyx);
          if (it != ls.end() && it->second.g > -overlap) continue;
          if (overlap < std::max(ctx.k, int64_t(0)) + ins_var) continue;
          len_olp += overlap;
        }
        if (static_cast<double>(len_olp) >
            overlap_tol * static_cast<double>(len_sum))
          ok = false;
      }
    }
    if (!ok) continue;
    // checkConflictCnt_general
    std::unordered_map<int64_t, int64_t> rank;
    for (size_t i = 0; i < order.size(); ++i) rank[order[i].first] = i;
    double confl = 0, total = 0;
    for (auto& kv : ls) {
      int64_t x = static_cast<int64_t>(kv.first >> 32);
      int64_t y = static_cast<int64_t>(kv.first & 0xFFFFFFFFu);
      auto rx = rank.find(x), ry = rank.find(y);
      if (rx != rank.end() && ry != rank.end()) {
        total += kv.second.w;
        if (ry->second <= rx->second) confl += kv.second.w;
      }
    }
    if (total <= 0 || confl > confl_tol * total) continue;
    // adjacent-pair arbitration (orderContig.c:7074-7135): only the
    // REVERSED link exists between sort-adjacent (x, y) -> exchange when
    // small-insert evidence backs it (bySmall this rank, or the
    // contig-level small-rank history on long ranks — the
    // dh_cnt->bySmall consult) or the negative gap shows two
    // near-coincident contigs got flipped
    {
      bool changed = true;
      size_t guard = 0;
      while (changed && guard <= order.size()) {
        changed = false;
        ++guard;
        for (size_t i = 0; i + 1 < order.size(); ++i) {
          int64_t x = order[i].first, px = order[i].second;
          int64_t y = order[i + 1].first, py = order[i + 1].second;
          uint64_t kxy = (static_cast<uint64_t>(x) << 32) |
                         static_cast<uint32_t>(y);
          if (ls.count(kxy)) continue;
          uint64_t kyx = (static_cast<uint64_t>(y) << 32) |
                         static_cast<uint32_t>(x);
          auto rit = ls.find(kyx);
          if (rit == ls.end()) continue;
          double rev_w = rit->second.w;
          int64_t rev_g = rit->second.g;
          int64_t gap_xy = py - (px + ctx.chain_len_of(x));
          int64_t tmp_dis =
              ctx.chain_len_of(x) + ctx.chain_len_of(y) + gap_xy + rev_g;
          bool neg = ((-gap_xy > ctx.chain_len_of(x) ||
                       -gap_xy > ctx.chain_len_of(y)) &&
                      tmp_dis > 0 && tmp_dis < 500 && rev_w > 3);
          if (by_small || ctx.rev_small(y, x) || neg) {
            order[i] = {y, px};
            order[i + 1] = {x, py};
            changed = true;
            break;
          }
        }
      }
    }
    // arrangeNodes_general: rewrite member links as the committed chain
    std::unordered_set<int64_t> members, members_m;
    for (auto& kv : pos) {
      members.insert(kv.first);
      members_m.insert(kv.first ^ 1);
    }
    std::unordered_map<uint64_t, double> support;
    std::vector<uint64_t> hit;
    for (auto& kv : ls) {
      int64_t x = static_cast<int64_t>(kv.first >> 32);
      int64_t y = static_cast<int64_t>(kv.first & 0xFFFFFFFFu);
      if ((members.count(x) && members.count(y)) ||
          (members_m.count(x) && members_m.count(y)))
        hit.push_back(kv.first);
    }
    for (uint64_t kp : hit) {
      support[kp] = ls[kp].w;
      ls.erase(kp);
    }
    for (size_t i = 0; i + 1 < order.size(); ++i) {
      int64_t x = order[i].first, px = order[i].second;
      int64_t y = order[i + 1].first, py = order[i + 1].second;
      int64_t ggap = py - (px + ctx.chain_len_of(x));
      auto sit = support.find(key2(x, y));
      double wgt = sit != support.end() ? sit->second : 1.0;
      ls[key2(x, y)] = {wgt, ggap};
      ls[key2(y ^ 1, x ^ 1)] = {wgt, ggap};
    }
    for (int64_t mnode : members) {
      consumed.insert(mnode);
      consumed.insert(mnode ^ 1);
    }
    ctx.n_linearized++;
  }
}

// --- maskPuzzle (scaffold.py _mask_puzzle) --------------------------------
void mask_puzzle(Ctx& ctx, LinkSet& ls) {
  std::unordered_map<int64_t, int64_t> outd, ind;
  for (auto& kv : ls) {
    outd[static_cast<int64_t>(kv.first >> 32)]++;
    ind[static_cast<int64_t>(kv.first & 0xFFFFFFFFu)]++;
  }
  std::unordered_set<int64_t> masked_nodes;
  std::set<int64_t> nodes;
  for (auto& kv : outd) nodes.insert(kv.first);
  for (auto& kv : ind) nodes.insert(kv.first);
  for (int64_t node : nodes) {
    int64_t od = outd.count(node) ? outd[node] : 0;
    int64_t id = ind.count(node) ? ind[node] : 0;
    if (od <= 1 && id <= 1) continue;
    int64_t ch = node >> 1;
    if (ctx.n_chain_ctgs(ch) != 1) continue;
    int64_t c = ctx.chain_ctgs[ctx.chain_ptr[ch]];
    if (!ctx.mask[c]) {
      ctx.mask[c] = ctx.mask[c ^ 1] = 1;
      masked_nodes.insert(node);
      masked_nodes.insert(node ^ 1);
      ctx.n_masked_puzzle++;
    }
  }
  if (!masked_nodes.empty()) {
    std::vector<uint64_t> del;
    for (auto& kv : ls) {
      int64_t x = static_cast<int64_t>(kv.first >> 32);
      int64_t y = static_cast<int64_t>(kv.first & 0xFFFFFFFFu);
      if (masked_nodes.count(x) || masked_nodes.count(y))
        del.push_back(kv.first);
    }
    for (uint64_t kp : del) ls.erase(kp);
  }
}

// --- removeTransitive (orderContig.c:1765, faithful) ----------------------
std::vector<int64_t> valid_outs(
    const LinkSet& ls,
    const std::map<int64_t, std::vector<int64_t>>& out_links, int64_t x) {
  std::vector<int64_t> v;
  auto it = out_links.find(x);
  if (it == out_links.end()) return v;
  for (int64_t y : it->second)
    if (ls.count(key2(x, y))) v.push_back(y);
  return v;
}

// linearC2C (orderContig.c:1433) on the contracted chain graph: walk the
// unique-successor path down from B (reaching C = linear), then the
// unique-predecessor path up from C; if both dead-end with window budget
// left, link the frontiers (the reference allocates a weight-0 CONNECT).
// Returns linear?; *new_link = {c1p, c2p, gap} when a frontier link is to
// be installed (new_link[0] < 0 otherwise).
bool linear_c2c(const LinkSet& ls,
                const std::map<int64_t, std::vector<int64_t>>& out_links,
                int64_t b, int64_t c, int64_t mn, int64_t mx,
                const Ctx& ctx, int64_t starter, int64_t* new_link) {
  new_link[0] = -1;
  int64_t length = 0, cur = b, hops = 0;
  for (;;) {
    auto outs = valid_outs(ls, out_links, cur);
    if (outs.size() != 1) break;
    int64_t nxt = outs[0];
    length += ls.at(key2(cur, nxt)).g + ctx.chain_len_of(nxt);
    if (nxt == c) return true;
    if (length > mx || nxt == starter || nxt == (starter ^ 1)) return false;
    cur = nxt;
    if (++hops > 64) return false;
  }
  if (!valid_outs(ls, out_links, cur).empty()) return false;
  int64_t c1p = cur;
  int64_t ctg = c ^ 1;
  hops = 0;
  for (;;) {
    auto outs = valid_outs(ls, out_links, ctg);
    if (outs.size() != 1) break;
    int64_t nxt = outs[0];
    length += ls.at(key2(ctg, nxt)).g + ctx.chain_len_of(nxt);
    if (length > mx || nxt == starter || nxt == (starter ^ 1)) return false;
    ctg = nxt;
    if (++hops > 64) return false;
  }
  if (!valid_outs(ls, out_links, ctg).empty()) return false;
  int64_t c2p = ctg ^ 1;
  int64_t mn2 = mn - length, mx2 = mx - length;
  if (c1p == c2p || c1p == ctg || mx2 < 0) return false;
  if (ls.count(key2(c1p, c2p))) return true;
  new_link[0] = c1p;
  new_link[1] = c2p;
  new_link[2] = std::max((mn2 + mx2) / 2, static_cast<int64_t>(0));
  return true;
}

int64_t remove_transitive(Ctx& ctx, LinkSet& ls, int64_t ins_var,
                          int max_rounds = 8) {
  int64_t n_dropped = 0;
  for (int round = 0; round < max_rounds; ++round) {
    std::map<int64_t, std::vector<int64_t>> out_links;
    for (auto& kv : ls)
      out_links[static_cast<int64_t>(kv.first >> 32)].push_back(
          static_cast<int64_t>(kv.first & 0xFFFFFFFFu));
    bool changed = false;
    for (auto& okv : out_links) {
      int64_t a = okv.first;
      auto outs = valid_outs(ls, out_links, a);
      if (outs.size() != 2) continue;
      int64_t b = std::min(outs[0], outs[1]);
      int64_t c = std::max(outs[0], outs[1]);
      if (ls.at(key2(a, b)).g > ls.at(key2(a, c)).g) std::swap(b, c);
      if (valid_outs(ls, out_links, c ^ 1).size() > 2) continue;
      if (valid_outs(ls, out_links, b ^ 1).size() > 1) continue;
      int64_t gb = ls.at(key2(a, b)).g, gc = ls.at(key2(a, c)).g;
      int64_t base = gc - gb - ctx.chain_len_of(b);
      int64_t mn = base - ins_var / 2, mx = base + ins_var / 2;
      if (mx < 0) continue;
      // temporarily delete A->C so the walks don't route through it
      LinkVal wc = ls.at(key2(a, c));
      ls.erase(key2(a, c));
      auto mit = ls.find(key2(c ^ 1, a ^ 1));
      bool had_mirror = mit != ls.end();
      LinkVal mv{};
      if (had_mirror) {
        mv = mit->second;
        ls.erase(mit);
      }
      int64_t new_link[3];
      bool linear =
          linear_c2c(ls, out_links, b, c, mn, mx, ctx, a, new_link);
      if (!linear) {
        ls[key2(a, c)] = wc;
        if (had_mirror) ls[key2(c ^ 1, a ^ 1)] = mv;
        continue;
      }
      if (new_link[0] >= 0) {
        ls[key2(new_link[0], new_link[1])] = {0.0, new_link[2]};
        ls[key2(new_link[1] ^ 1, new_link[0] ^ 1)] = {0.0, new_link[2]};
      }
      changed = true;
      ++n_dropped;
    }
    if (!changed) break;
  }
  return n_dropped;
}

// --- maskRepeat / checkUnique (orderContig.c:2222/2147) -------------------
bool check_unique(const LinkSet& ls,
                  const std::map<int64_t, std::vector<int64_t>>& out_links,
                  int64_t node, const Ctx& ctx, double tolerance) {
  std::vector<std::pair<int64_t, int64_t>> members{{0, node}};
  for (int64_t b : valid_outs(ls, out_links, node))
    members.emplace_back(ls.at(key2(node, b)).g + ctx.chain_len_of(b), b);
  if (members.size() <= 2) return true;
  std::sort(members.begin(), members.end());
  std::vector<std::pair<int64_t, int64_t>> pos;
  pos.reserve(members.size());
  int64_t len_sum = 0;
  for (auto& dm : members) {
    pos.emplace_back(dm.first - ctx.chain_len_of(dm.second), dm.second);
    len_sum += ctx.chain_len_of(dm.second);
  }
  if (len_sum < 1) return true;
  int64_t len_olp = 0;
  for (size_t i = 0; i + 1 < pos.size(); ++i) {
    int64_t overlap =
        pos[i].first + ctx.chain_len_of(pos[i].second) - pos[i + 1].first;
    if (overlap > 0) len_olp += overlap;
    if (static_cast<double>(len_olp) > tolerance * len_sum) return false;
  }
  return true;
}

int64_t mask_repeat(Ctx& ctx, LinkSet& ls, double tolerance) {
  std::map<int64_t, std::vector<int64_t>> out_links;
  for (auto& kv : ls)
    out_links[static_cast<int64_t>(kv.first >> 32)].push_back(
        static_cast<int64_t>(kv.first & 0xFFFFFFFFu));
  double cvg_avg = 0;
  bool have_cvg = false;
  if (ctx.cvg) {
    double s = 0;
    int64_t n = 0;
    for (int64_t i = 0; i < ctx.n_dir; ++i)
      if (ctx.cvg[i] > 0) {
        s += ctx.cvg[i];
        ++n;
      }
    if (n) {
      cvg_avg = s / n;
      have_cvg = true;
    }
  }
  int64_t n_masked = 0;
  std::unordered_set<int64_t> masked_nodes;
  for (auto& okv : out_links) {
    int64_t node = okv.first;
    int64_t outn = static_cast<int64_t>(valid_outs(ls, out_links, node).size());
    int64_t inn =
        static_cast<int64_t>(valid_outs(ls, out_links, node ^ 1).size());
    if (outn <= 1 && inn <= 1) continue;
    int64_t ch = node >> 1;
    if (ctx.chain_ptr[ch + 1] - ctx.chain_ptr[ch] != 1) continue;
    int64_t c = ctx.chain_ctgs[ctx.chain_ptr[ch]];
    if (ctx.mask[c]) continue;
    bool is_repeat = false;
    if (have_cvg && cvg_avg > 0 && ctx.cvg[c] > 1.4 * cvg_avg) {
      is_repeat = true;
    } else {
      bool ok_in = (inn <= 1) ||
                   check_unique(ls, out_links, node ^ 1, ctx, tolerance);
      bool ok_out =
          (outn <= 1) || check_unique(ls, out_links, node, ctx, tolerance);
      is_repeat = !(ok_in && ok_out);
    }
    if (is_repeat) {
      ctx.mask[c] = ctx.mask[c ^ 1] = 1;
      masked_nodes.insert(node);
      masked_nodes.insert(node ^ 1);
      ++n_masked;
    }
  }
  if (!masked_nodes.empty()) {
    std::vector<uint64_t> del;
    for (auto& kv : ls) {
      int64_t x = static_cast<int64_t>(kv.first >> 32);
      int64_t y = static_cast<int64_t>(kv.first & 0xFFFFFFFFu);
      if (masked_nodes.count(x) || masked_nodes.count(y))
        del.push_back(kv.first);
    }
    for (uint64_t kp : del) ls.erase(kp);
  }
  return n_masked;
}

}  // namespace

extern "C" {

// One ordering rank.  Returns 0 on success.
// out_counts: [n_chains_out, total_out_ctgs, n_snp, n_masked, n_linearized]
int64_t scaff_ordering_rank(
    int64_t n_dir, const int64_t* ctg_len, uint8_t* mask, const double* cvg,
    uint8_t* bubble_flag, int64_t n_chains, const int64_t* chain_ptr,
    const int64_t* chain_ctgs, const int64_t* chain_gaps, int64_t m,
    const int64_t* lc1, const int64_t* lc2, const int64_t* lw,
    const int64_t* lgap, int64_t pair_cutoff, int64_t insert_size,
    int64_t last_rank, int64_t k, double cvg4snp, int64_t snp_enabled,
    const uint64_t* head_sig, const uint64_t* tail_sig,
    int64_t n_small, const uint64_t* small_keys,
    int64_t* out_chain_ptr, int64_t* out_ctgs, int64_t* out_gaps,
    int64_t* out_snp_pairs, int64_t* out_counts) {
  Ctx ctx;
  ctx.n_dir = n_dir;
  ctx.ctg_len = ctg_len;
  ctx.mask = mask;
  ctx.cvg = cvg;
  ctx.bubble_flag = bubble_flag;
  ctx.n_chains = n_chains;
  ctx.chain_ptr = chain_ptr;
  ctx.chain_ctgs = chain_ctgs;
  ctx.chain_gaps = chain_gaps;
  ctx.insert_size = insert_size;
  ctx.k = k;
  ctx.cvg4snp = cvg4snp;
  ctx.snp_enabled = static_cast<int>(snp_enabled);
  ctx.head_sig = head_sig;
  ctx.tail_sig = tail_sig;
  ctx.n_small = n_small;
  ctx.small_keys = small_keys;
  ctx.snp_pairs = out_snp_pairs;
  ctx.n_snp = 0;
  ctx.n_masked_puzzle = 0;
  ctx.n_linearized = 0;

  // --- chain maps (scaffold.py _chain_maps) -------------------------------
  std::vector<int64_t> cid(n_dir, -1), off(n_dir, 0), tail(n_dir, 0);
  std::vector<uint8_t> flip(n_dir, 0);
  ctx.chain_total.assign(n_chains, 0);
  for (int64_t ch = 0; ch < n_chains; ++ch) {
    int64_t b = chain_ptr[ch], e = chain_ptr[ch + 1];
    int64_t gb = b - ch;  // gap array offset for this chain
    int64_t total = 0;
    for (int64_t j = b; j < e; ++j) total += ctg_len[chain_ctgs[j]];
    for (int64_t j = b; j + 1 < e; ++j) total += gap_span(chain_gaps[gb + (j - b)]);
    ctx.chain_total[ch] = total;
    int64_t acc = 0;
    for (int64_t j = b; j < e; ++j) {
      int64_t c = chain_ctgs[j];
      int64_t cl = ctg_len[c];
      cid[c] = ch;
      flip[c] = 0;
      off[c] = acc;
      tail[c] = total - acc - cl;
      int64_t ct = c ^ 1;
      cid[ct] = ch;
      flip[ct] = 1;
      off[ct] = total - acc - cl;
      tail[ct] = acc;
      acc += cl;
      if (j + 1 < e) acc += gap_span(chain_gaps[gb + (j - b)]);
    }
  }

  // --- filter + lift links to chain level, aggregate ----------------------
  struct Lift {
    uint64_t key;
    int64_t w;
    int64_t g;
  };
  std::vector<Lift> lifts;
  lifts.reserve(m);
  for (int64_t i = 0; i < m; ++i) {
    if (lw[i] < pair_cutoff) continue;  // deleteWeakCnt
    int64_t a = lc1[i], b = lc2[i];
    if (mask[a] || mask[b]) continue;
    int64_t ch1 = cid[a], ch2 = cid[b];
    if (ch1 < 0 || ch2 < 0 || ch1 == ch2) continue;
    int64_t A = ch1 * 2 + flip[a];
    int64_t B = ch2 * 2 + flip[b];
    int64_t g_adj = lgap[i] - tail[a] - off[b];
    lifts.push_back({key2(A, B), lw[i], g_adj});
  }
  std::sort(lifts.begin(), lifts.end(),
            [](const Lift& x, const Lift& y) { return x.key < y.key; });
  LinkSet ls;
  for (size_t i = 0; i < lifts.size();) {
    size_t j = i;
    double wsum = 0, gw = 0;
    while (j < lifts.size() && lifts[j].key == lifts[i].key) {
      wsum += static_cast<double>(lifts[j].w);
      gw += static_cast<double>(lifts[j].g) * static_cast<double>(lifts[j].w);
      ++j;
    }
    int64_t gavg = static_cast<int64_t>(gw / std::max(wsum, 1.0));
    ls[lifts[i].key] = {wsum, gavg};
    i = j;
  }

  // --- linearization passes ------------------------------------------------
  int64_t ins_var =
      insert_size >= 1000 ? 50 : (insert_size >= 300 ? 30 : 20);
  remove_transitive(ctx, ls, ins_var);
  bool snp = snp_enabled && insert_size < 1000 && cvg4snp > 1e-3 &&
             cvg != nullptr && head_sig != nullptr;
  const bool by_small = ctx.insert_size <= 1000;
  general_linearization(ctx, ls, ins_var, 0.05, 0.05, snp, by_small);
  // maskRepeat between the two simplifyCnt passes (ordering:2377)
  mask_repeat(ctx, ls, 0.05);
  remove_transitive(ctx, ls, ins_var);
  if (last_rank)
    general_linearization(ctx, ls, ins_var, 0.10, 0.10, snp, by_small);

  mask_puzzle(ctx, ls);

  // --- freezing: unique-successor merging ----------------------------------
  std::unordered_map<int64_t, std::pair<int64_t, int64_t>> succ;  // a->(b,g)
  std::unordered_map<int64_t, int64_t> pred_count, out_count;
  std::unordered_map<int64_t, std::pair<int64_t, int64_t>> only_out;
  for (auto& kv : ls) {
    int64_t a = static_cast<int64_t>(kv.first >> 32);
    int64_t b = static_cast<int64_t>(kv.first & 0xFFFFFFFFu);
    out_count[a]++;
    only_out[a] = {b, kv.second.g};
  }
  for (auto& kv : out_count) {
    if (kv.second == 1) {
      auto& bg = only_out[kv.first];
      succ[kv.first] = bg;
      pred_count[bg.first]++;
    }
  }
  std::unordered_map<int64_t, std::pair<int64_t, int64_t>> nxt;
  std::unordered_set<int64_t> has_pred;
  for (auto& kv : succ)
    if (pred_count[kv.second.first] == 1) {
      nxt[kv.first] = kv.second;
      has_pred.insert(kv.second.first);
    }

  std::vector<uint8_t> used(n_chains, 0);
  std::vector<int64_t> starts;
  starts.reserve(nxt.size());
  for (auto& kv : nxt) starts.push_back(kv.first);
  std::sort(starts.begin(), starts.end());
  for (int64_t i = 0; i < 2 * n_chains; ++i) starts.push_back(i);

  int64_t n_out = 0, ctg_pos = 0, gap_pos = 0;
  out_chain_ptr[0] = 0;
  for (int64_t start : starts) {
    int64_t ch = start >> 1;
    if (used[ch]) continue;
    if (has_pred.count(start)) continue;
    // walk the unique-successor path
    std::vector<int64_t> path{start};
    std::vector<int64_t> gaps;
    used[ch] = 1;
    int64_t cur = start;
    for (;;) {
      auto it = nxt.find(cur);
      if (it == nxt.end()) break;
      int64_t b = it->second.first;
      if (used[b >> 1]) break;
      path.push_back(b);
      gaps.push_back(it->second.second);
      used[b >> 1] = 1;
      cur = b;
    }
    // stitch (scaffold.py _stitch)
    for (size_t idx = 0; idx < path.size(); ++idx) {
      int64_t oc = path[idx];
      int64_t c2 = oc >> 1, o = oc & 1;
      int64_t b = chain_ptr[c2], e = chain_ptr[c2 + 1];
      int64_t gb = b - c2;
      if (idx > 0) out_gaps[gap_pos++] = gaps[idx - 1];
      if (!o) {
        for (int64_t j = b; j < e; ++j) out_ctgs[ctg_pos++] = chain_ctgs[j];
        for (int64_t j = b; j + 1 < e; ++j)
          out_gaps[gap_pos++] = chain_gaps[gb + (j - b)];
      } else {
        for (int64_t j = e - 1; j >= b; --j)
          out_ctgs[ctg_pos++] = chain_ctgs[j] ^ 1;
        for (int64_t j = e - 2; j >= b; --j)
          out_gaps[gap_pos++] = chain_gaps[gb + (j - b)];
      }
    }
    out_chain_ptr[++n_out] = ctg_pos;
  }

  out_counts[0] = n_out;
  out_counts[1] = ctg_pos;
  out_counts[2] = ctx.n_snp;
  out_counts[3] = ctx.n_masked_puzzle;
  out_counts[4] = ctx.n_linearized;
  return 0;
}

}  // extern "C"
