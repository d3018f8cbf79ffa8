// GBNF grammar engine: pushdown automaton over Unicode code points.
//
// Native C++ counterpart of the reference's grammar core
// (src/llama-grammar.{h,cpp}: rules -> element lists, stacks-of-positions,
// llama_grammar_accept advancing all viable stacks). Exposed through a tiny
// C ABI consumed via ctypes (tpullm/grammar/engine.py).
//
// Element encoding mirrors llama_gretype:
//   END=0, ALT=1, RULE_REF=2, CHAR=3, CHAR_NOT=4, CHAR_RNG_UPPER=5,
//   CHAR_ALT=6, CHAR_ANY=7
//
// Stacks hold indices into one flat element array, so grammar states clone
// and compare cheaply (the reference uses pointers into stable rule storage;
// indices give the same with safe copies).
//
// Build: g++ -O2 -shared -fPIC -o libtpullm_grammar.so grammar.cpp

#include <algorithm>
#include <cstdint>
#include <vector>

enum gretype : uint32_t {
  GRE_END = 0,
  GRE_ALT = 1,
  GRE_RULE_REF = 2,
  GRE_CHAR = 3,
  GRE_CHAR_NOT = 4,
  GRE_CHAR_RNG_UPPER = 5,
  GRE_CHAR_ALT = 6,
  GRE_CHAR_ANY = 7,
};

struct element {
  uint32_t type;
  uint32_t value;
};

using stack_t = std::vector<uint32_t>;  // element indices

struct grammar {
  std::vector<element> elems;      // all rules flattened
  std::vector<uint32_t> rule_off;  // start index per rule
  std::vector<stack_t> stacks;
};

static bool is_char_element(const element &e) {
  return e.type == GRE_CHAR || e.type == GRE_CHAR_NOT || e.type == GRE_CHAR_ANY;
}

// index just past the char class starting at i
static uint32_t class_end(const grammar &g, uint32_t i) {
  if (g.elems[i].type == GRE_CHAR_ANY) return i + 1;
  uint32_t p = i + 1;
  while (g.elems[p].type == GRE_CHAR_ALT || g.elems[p].type == GRE_CHAR_RNG_UPPER) p++;
  return p;
}

static bool match_class(const grammar &g, uint32_t i, uint32_t cp) {
  const element &e = g.elems[i];
  if (e.type == GRE_CHAR_ANY) return true;
  bool found = false;
  uint32_t p = i + 1;
  if (g.elems[p].type == GRE_CHAR_RNG_UPPER) {
    found = (e.value <= cp && cp <= g.elems[p].value);
    p++;
  } else {
    found = (cp == e.value);
  }
  while (g.elems[p].type == GRE_CHAR_ALT) {
    uint32_t l2 = g.elems[p].value;
    if (g.elems[p + 1].type == GRE_CHAR_RNG_UPPER) {
      found = found || (l2 <= cp && cp <= g.elems[p + 1].value);
      p += 2;
    } else {
      found = found || (cp == l2);
      p += 1;
    }
  }
  return (e.type == GRE_CHAR) ? found : !found;
}

// expand rule refs on top of the stack until a char element (or empty) tops it
// Depth guard: the Python parser rejects left-recursive grammars up front
// (llama_grammar_detect_left_recursion analogue), but a hand-constructed
// element array could still recurse unboundedly — beyond MAX_EXPAND_DEPTH the
// path is dropped (treated as non-viable) instead of overflowing the stack.
static const int MAX_EXPAND_DEPTH = 256;

static void advance_stack(const grammar &g, stack_t stack,
                          std::vector<stack_t> &out, int depth = 0) {
  if (depth > MAX_EXPAND_DEPTH) return;
  if (stack.empty()) {
    out.push_back(std::move(stack));
    return;
  }
  uint32_t top = stack.back();
  const element &e = g.elems[top];
  if (is_char_element(e)) {
    out.push_back(std::move(stack));
    return;
  }
  if (e.type == GRE_RULE_REF) {
    stack_t base(stack.begin(), stack.end() - 1);
    uint32_t cont = top + 1;
    if (g.elems[cont].type != GRE_END && g.elems[cont].type != GRE_ALT) {
      base.push_back(cont);
    }
    uint32_t p = g.rule_off[e.value];
    while (true) {
      stack_t st = base;
      if (g.elems[p].type != GRE_END && g.elems[p].type != GRE_ALT) {
        st.push_back(p);
      }
      advance_stack(g, std::move(st), out, depth + 1);
      while (g.elems[p].type != GRE_END && g.elems[p].type != GRE_ALT) {
        if (is_char_element(g.elems[p])) {
          p = class_end(g, p);
        } else {
          p++;
        }
      }
      if (g.elems[p].type == GRE_END) break;
      p++;  // past ALT; an immediately-following END is an empty alternate
    }
    return;
  }
  out.push_back(std::move(stack));  // END/ALT: shouldn't happen
}

static void dedup(std::vector<stack_t> &v) {
  std::sort(v.begin(), v.end());
  v.erase(std::unique(v.begin(), v.end()), v.end());
}

static void accept_cp(grammar &g, uint32_t cp) {
  std::vector<stack_t> next;
  for (auto &stack : g.stacks) {
    if (stack.empty()) continue;
    uint32_t top = stack.back();
    if (!is_char_element(g.elems[top])) continue;
    if (!match_class(g, top, cp)) continue;
    uint32_t after = class_end(g, top);
    stack_t base(stack.begin(), stack.end() - 1);
    if (g.elems[after].type != GRE_END && g.elems[after].type != GRE_ALT) {
      base.push_back(after);
    }
    advance_stack(g, std::move(base), next);
  }
  dedup(next);
  g.stacks = std::move(next);
}

static bool can_accept_cp(const grammar &g, uint32_t cp) {
  for (auto &stack : g.stacks) {
    if (stack.empty()) continue;
    uint32_t top = stack.back();
    if (is_char_element(g.elems[top]) && match_class(g, top, cp)) return true;
  }
  return false;
}

extern "C" {

grammar *tpg_init(const element *elems, const uint32_t *rule_offsets,
                  uint32_t n_rules, uint32_t n_elems, uint32_t root) {
  auto *g = new grammar();
  g->elems.assign(elems, elems + n_elems);
  g->rule_off.assign(rule_offsets, rule_offsets + n_rules);
  uint32_t p = g->rule_off[root];
  while (true) {
    stack_t st;
    if (g->elems[p].type != GRE_END && g->elems[p].type != GRE_ALT) st.push_back(p);
    advance_stack(*g, std::move(st), g->stacks);
    while (g->elems[p].type != GRE_END && g->elems[p].type != GRE_ALT) {
      if (is_char_element(g->elems[p])) {
        p = class_end(*g, p);
      } else {
        p++;
      }
    }
    if (g->elems[p].type == GRE_END) break;
    p++;  // past ALT; empty alternates are processed too
  }
  dedup(g->stacks);
  return g;
}

void tpg_free(grammar *g) { delete g; }

grammar *tpg_clone(const grammar *g) { return new grammar(*g); }

// advance through a code-point sequence; returns #cps consumed (n = all ok)
int tpg_accept(grammar *g, const uint32_t *cps, int n) {
  for (int i = 0; i < n; i++) {
    if (!can_accept_cp(*g, cps[i])) return i;
    accept_cp(*g, cps[i]);
  }
  return n;
}

// test whether the cp sequence can be fully consumed (state untouched)
int tpg_check(const grammar *g, const uint32_t *cps, int n) {
  grammar tmp(*g);
  for (int i = 0; i < n; i++) {
    if (!can_accept_cp(tmp, cps[i])) return 0;
    accept_cp(tmp, cps[i]);
  }
  return 1;
}

// 1 if the grammar can terminate now (some stack empty)
int tpg_done(const grammar *g) {
  for (auto &s : g->stacks)
    if (s.empty()) return 1;
  return 0;
}

// 1 if no viable stacks remain (dead state)
int tpg_dead(const grammar *g) { return g->stacks.empty() ? 1 : 0; }

// batch check: for each piece (flattened cps + offsets), write 1/0 allowed
void tpg_filter(const grammar *g, const uint32_t *cps, const int32_t *offs,
                int n_pieces, uint8_t *out) {
  for (int i = 0; i < n_pieces; i++) {
    int lo = offs[i], hi = offs[i + 1];
    out[i] = (uint8_t)tpg_check(g, cps + lo, hi - lo);
  }
}

}  // extern "C"
