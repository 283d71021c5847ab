// Native data-layer runtime: site-pattern compression, Newick parsing,
// FASTA parsing.
//
// Role of the reference's host-side data machinery on its largest
// workloads (ref: src/dr/evolution/alignment/SitePatterns.java:50-58
// pattern compression; src/dr/evolution/io/NewickImporter.java /
// FastaImporter.java) and of its native runtime layer generally (the
// reference keeps hot non-likelihood paths in C++/JNI; SURVEY.md §2.4).
// Python fallbacks exist for every entry point; this library is the fast
// path for Makona-scale alignments (10^3-10^4 taxa x 10^4-10^5 sites)
// and thorney-scale trees (10^5+ tips), where pure-Python parsing
// dominates startup.
//
// Exposed as a plain C ABI for ctypes (no pybind11 in the image).

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <array>
#include <string>
#include <unordered_map>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------
// Site-pattern compression: states [n_taxa, n_sites] (site-major not
// required; row-major taxa x sites). Outputs unique pattern columns
// (taxa-major [n_taxa, n_patterns]) + weights, first-occurrence order
// (matching SitePatterns' ordering semantics).
// ---------------------------------------------------------------------
int64_t compress_patterns(const uint8_t* states, int64_t n_taxa,
                          int64_t n_sites, uint8_t* out_patterns,
                          double* out_weights) {
  std::unordered_map<std::string, int64_t> index;
  index.reserve(static_cast<size_t>(n_sites) * 2);
  std::string key(static_cast<size_t>(n_taxa), '\0');
  int64_t n_patterns = 0;
  for (int64_t s = 0; s < n_sites; ++s) {
    for (int64_t t = 0; t < n_taxa; ++t) {
      key[static_cast<size_t>(t)] =
          static_cast<char>(states[t * n_sites + s]);
    }
    auto it = index.find(key);
    if (it == index.end()) {
      int64_t p = n_patterns++;
      index.emplace(key, p);
      for (int64_t t = 0; t < n_taxa; ++t) {
        out_patterns[t * n_sites + p] = states[t * n_sites + s];
      }
      out_weights[p] = 1.0;
    } else {
      out_weights[it->second] += 1.0;
    }
  }
  return n_patterns;
}

// ---------------------------------------------------------------------
// Newick parsing (iterative; rooted binary trees). Writes flat arrays:
//   parent  int32[2N-1], children int32[2N-1, 2], lengths f64[2N-1]
//   (branch length above each node; root gets 0),
//   tip name offsets into a concatenated name buffer.
// Returns number of tips, or -1 on parse error, -2 if non-binary.
// ---------------------------------------------------------------------
int64_t parse_newick(const char* newick, int64_t max_nodes,
                     int32_t* parent, int32_t* children, double* lengths,
                     char* name_buf, int64_t name_buf_size,
                     int64_t* name_offsets) {
  const char* p = newick;
  std::vector<int32_t> stack;           // open internal nodes
  std::vector<std::vector<int32_t>> kids;  // children per open node
  int64_t n_tips = 0;
  int64_t next_node = 0;  // temp ids; tips re-numbered later
  std::vector<int32_t> tmp_parent;
  std::vector<double> tmp_len;
  std::vector<int8_t> is_tip;
  std::vector<std::pair<int64_t, int64_t>> tip_names;  // (node, offset)
  std::vector<std::array<int32_t, 2>> tmp_children;
  int64_t name_pos = 0;

  auto new_node = [&](bool tip) -> int64_t {
    tmp_parent.push_back(-1);
    tmp_len.push_back(0.0);
    is_tip.push_back(tip ? 1 : 0);
    tmp_children.push_back({-1, -1});
    return next_node++;
  };

  auto skip_ws = [&]() {
    while (*p == ' ' || *p == '\t' || *p == '\n' || *p == '\r') ++p;
  };

  // shunting parse
  std::vector<int64_t> finished;  // node whose label/length comes next
  int64_t current = -1;
  skip_ws();
  while (*p && *p != ';') {
    skip_ws();
    if (*p == '(') {
      int64_t node = new_node(false);
      if (!stack.empty()) {
        // child of the open node on the stack top (registered on ')')
      }
      stack.push_back(static_cast<int32_t>(node));
      kids.emplace_back();
      ++p;
    } else if (*p == ',' ) {
      if (current >= 0 && !stack.empty()) {
        kids.back().push_back(static_cast<int32_t>(current));
      }
      current = -1;
      ++p;
    } else if (*p == ')') {
      if (current >= 0 && !stack.empty()) {
        kids.back().push_back(static_cast<int32_t>(current));
      }
      int64_t node = stack.back();
      stack.pop_back();
      auto ch = kids.back();
      kids.pop_back();
      if (ch.size() != 2) return -2;  // binary only
      tmp_children[static_cast<size_t>(node)] = {ch[0], ch[1]};
      tmp_parent[static_cast<size_t>(ch[0])] = static_cast<int32_t>(node);
      tmp_parent[static_cast<size_t>(ch[1])] = static_cast<int32_t>(node);
      current = node;
      ++p;
    } else if (*p == ':') {
      ++p;
      char* end = nullptr;
      double v = strtod(p, &end);
      if (end == p || current < 0) return -1;
      tmp_len[static_cast<size_t>(current)] = v;
      p = end;
    } else if (*p == '[') {
      int depth = 0;
      while (*p) {
        if (*p == '[') ++depth;
        if (*p == ']') {
          --depth;
          if (depth == 0) { ++p; break; }
        }
        ++p;
      }
    } else {
      // label (tip name or internal label)
      const char* start = p;
      bool quoted = (*p == '\'');
      if (quoted) {
        ++p;
        start = p;
        while (*p && *p != '\'') ++p;
      } else {
        while (*p && !strchr(",():;[", *p)) ++p;
      }
      int64_t len = p - start;
      if (quoted && *p == '\'') ++p;
      if (current < 0) {
        // a tip
        int64_t node = new_node(true);
        current = node;
        if (name_pos + len + 1 > name_buf_size) return -3;
        memcpy(name_buf + name_pos, start, static_cast<size_t>(len));
        name_buf[name_pos + len] = '\0';
        tip_names.emplace_back(node, name_pos);
        name_pos += len + 1;
        ++n_tips;
      }
      // internal labels ignored
    }
  }
  if (!stack.empty() || current < 0) return -1;
  int64_t m = next_node;
  if (m != 2 * n_tips - 1 || m > max_nodes) return -1;

  // renumber: tips 0..N-1 in appearance order, internals N..M-1
  std::vector<int32_t> remap(static_cast<size_t>(m));
  int32_t tip_id = 0;
  int32_t int_id = static_cast<int32_t>(n_tips);
  for (int64_t i = 0; i < m; ++i) {
    remap[static_cast<size_t>(i)] = is_tip[static_cast<size_t>(i)]
        ? tip_id++ : int_id++;
  }
  for (int64_t i = 0; i < m; ++i) {
    int32_t ni = remap[static_cast<size_t>(i)];
    parent[ni] = tmp_parent[static_cast<size_t>(i)] < 0
        ? -1 : remap[static_cast<size_t>(tmp_parent[static_cast<size_t>(i)])];
    lengths[ni] = tmp_len[static_cast<size_t>(i)];
    auto& ch = tmp_children[static_cast<size_t>(i)];
    children[2 * ni] = ch[0] < 0 ? -1 : remap[static_cast<size_t>(ch[0])];
    children[2 * ni + 1] = ch[1] < 0 ? -1 : remap[static_cast<size_t>(ch[1])];
  }
  for (size_t k = 0; k < tip_names.size(); ++k) {
    name_offsets[remap[static_cast<size_t>(tip_names[k].first)]] =
        tip_names[k].second;
  }
  return n_tips;
}

// ---------------------------------------------------------------------
// FASTA parsing with a caller-supplied code table (256 entries mapping
// ASCII -> state code; 0xFF = skip char e.g. whitespace).
// Two-call protocol: pass out_states=NULL to get n_taxa (and fill
// seq_len[0] with the sequence length); then call again with buffers.
// ---------------------------------------------------------------------
int64_t parse_fasta(const char* path, const uint8_t* code_table,
                    uint8_t* out_states, int64_t* seq_len,
                    char* name_buf, int64_t name_buf_size,
                    int64_t* name_offsets) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  std::string line;
  line.reserve(1 << 16);
  int64_t n_taxa = 0;
  int64_t cur_len = 0;
  int64_t expected = seq_len ? *seq_len : 0;
  int64_t name_pos = 0;
  bool counting = (out_states == nullptr);
  int64_t max_len = 0;
  char buf[1 << 16];
  while (fgets(buf, sizeof(buf), f)) {
    size_t blen = strlen(buf);
    if (buf[0] == '>') {
      if (n_taxa > 0) max_len = cur_len > max_len ? cur_len : max_len;
      if (!counting) {
        // record name
        size_t e = blen;
        while (e > 1 && (buf[e - 1] == '\n' || buf[e - 1] == '\r')) --e;
        int64_t len = static_cast<int64_t>(e) - 1;
        if (name_pos + len + 1 > name_buf_size) { fclose(f); return -3; }
        memcpy(name_buf + name_pos, buf + 1, static_cast<size_t>(len));
        name_buf[name_pos + len] = '\0';
        name_offsets[n_taxa] = name_pos;
        name_pos += len + 1;
      }
      ++n_taxa;
      cur_len = 0;
    } else {
      for (size_t i = 0; i < blen; ++i) {
        uint8_t code = code_table[static_cast<uint8_t>(buf[i])];
        if (code == 0xFF) continue;
        if (!counting) {
          if (cur_len >= expected) { fclose(f); return -4; }
          out_states[(n_taxa - 1) * expected + cur_len] = code;
        }
        ++cur_len;
      }
    }
  }
  max_len = cur_len > max_len ? cur_len : max_len;
  fclose(f);
  if (counting && seq_len) *seq_len = max_len;
  return n_taxa;
}

}  // extern "C"
