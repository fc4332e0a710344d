// N3/N6 — oracle CLI: reference-semantics operators (hash join, sort-merge
// join, hash aggregate, filter) + datagen + canonical dump/checksum
// (SURVEY.md §2.3, §4.4). Single-threaded, deterministic, independent of the
// engine's algorithms. Driven by pytest (tests/test_oracle_parity.py).
//
// Usage:
//   oracle datagen  --kind=uniform|zipf --rows=N --nkeys=K --payloads=P
//                   --seed=S [--theta=T] --out=f.tpqc
//   oracle join     --algo=hash|merge --left=a.tpqc --right=b.tpqc --out=c.tpqc
//   oracle aggregate --in=a.tpqc --out=b.tpqc        (group by key: count, sums)
//   oracle filter   --in=a.tpqc --col=key --op=lt --value=X --out=b.tpqc
//   oracle canon    --in=a.tpqc --out=b.tpqc
//   oracle checksum --in=a.tpqc                       (prints u64)

#include <cstdio>
#include <map>
#include <string>

#include "common.h"
#include "datagen.h"
#include "radix_sort.h"
#include "rh_table.h"

using namespace oracle;

static std::map<std::string, std::string> parse_args(int argc, char** argv) {
  std::map<std::string, std::string> m;
  for (int i = 2; i < argc; i++) {
    std::string a = argv[i];
    if (a.rfind("--", 0) != 0) throw std::runtime_error("bad arg " + a);
    auto eq = a.find('=');
    if (eq == std::string::npos) throw std::runtime_error("want --k=v: " + a);
    m[a.substr(2, eq - 2)] = a.substr(eq + 1);
  }
  return m;
}

static std::string need(std::map<std::string, std::string>& m, const std::string& k) {
  auto it = m.find(k);
  if (it == m.end()) throw std::runtime_error("missing --" + k);
  return it->second;
}

// Inner equi-join output schema: key, r_<R payloads...>, s_<S payloads...>.
static Tab make_join_output(Tab& R, Tab& S) {
  Tab out;
  out.cols.push_back({"key", {}});
  for (auto& c : R.cols)
    if (c.name != "key") out.cols.push_back({"r_" + c.name, {}});
  for (auto& c : S.cols)
    if (c.name != "key") out.cols.push_back({"s_" + c.name, {}});
  return out;
}

static void emit_pair(Tab& out, Tab& R, Tab& S, size_t ri, size_t si) {
  size_t o = 0;
  out.cols[o++].data.push_back(R.find("key")->data[ri]);
  for (auto& c : R.cols)
    if (c.name != "key") out.cols[o++].data.push_back(c.data[ri]);
  for (auto& c : S.cols)
    if (c.name != "key") out.cols[o++].data.push_back(c.data[si]);
}

static Tab hash_join(Tab& R, Tab& S) {
  // Build robin-hood table on R (the left/build side), probe with S.
  auto& rk = R.find("key")->data;
  auto& sk = S.find("key")->data;
  RHTable table(rk.size());
  for (size_t i = 0; i < rk.size(); i++) table.insert(rk[i], (uint32_t)i);
  Tab out = make_join_output(R, S);
  for (size_t j = 0; j < sk.size(); j++)
    table.lookup_all(sk[j], [&](uint32_t ri) { emit_pair(out, R, S, ri, j); });
  return out;
}

static Tab merge_join(Tab& R, Tab& S) {
  auto& rk = R.find("key")->data;
  auto& sk = S.find("key")->data;
  auto rp = radix_sort_perm(rk);
  auto sp = radix_sort_perm(sk);
  Tab out = make_join_output(R, S);
  size_t i = 0, j = 0;
  while (i < rp.size() && j < sp.size()) {
    int64_t a = rk[rp[i]], b = sk[sp[j]];
    if (a < b)
      i++;
    else if (b < a)
      j++;
    else {
      size_t ie = i;
      while (ie < rp.size() && rk[rp[ie]] == a) ie++;
      size_t je = j;
      while (je < sp.size() && sk[sp[je]] == a) je++;
      for (size_t x = i; x < ie; x++)
        for (size_t y = j; y < je; y++) emit_pair(out, R, S, rp[x], sp[y]);
      i = ie;
      j = je;
    }
  }
  return out;
}

// Group-by key -> count + wrapping int64 sum of every payload column.
static Tab aggregate(Tab& T) {
  auto& k = T.find("key")->data;
  auto perm = radix_sort_perm(k);
  Tab out;
  out.cols.push_back({"key", {}});
  out.cols.push_back({"count", {}});
  for (auto& c : T.cols)
    if (c.name != "key") out.cols.push_back({"sum_" + c.name, {}});
  size_t i = 0;
  while (i < perm.size()) {
    int64_t key = k[perm[i]];
    size_t e = i;
    int64_t cnt = 0;
    std::vector<int64_t> sums(out.cols.size() - 2, 0);
    while (e < perm.size() && k[perm[e]] == key) {
      size_t s = 0;
      for (auto& c : T.cols)
        if (c.name != "key") {
          sums[s] = (int64_t)((uint64_t)sums[s] + (uint64_t)c.data[perm[e]]);
          s++;
        }
      cnt++;
      e++;
    }
    out.cols[0].data.push_back(key);
    out.cols[1].data.push_back(cnt);
    for (size_t s = 0; s < sums.size(); s++) out.cols[2 + s].data.push_back(sums[s]);
    i = e;
  }
  return out;
}

static Tab filter(Tab& T, const std::string& col, const std::string& op, int64_t value) {
  auto* c = T.find(col);
  if (!c) throw std::runtime_error("no column " + col);
  Tab out;
  for (auto& cc : T.cols) out.cols.push_back({cc.name, {}});
  for (size_t i = 0; i < T.nrows(); i++) {
    int64_t v = c->data[i];
    bool keep = op == "lt"   ? v < value
                : op == "le" ? v <= value
                : op == "gt" ? v > value
                : op == "ge" ? v >= value
                : op == "eq" ? v == value
                : op == "ne" ? v != value
                             : throw std::runtime_error("bad op " + op);
    if (keep)
      for (size_t ci = 0; ci < T.cols.size(); ci++)
        out.cols[ci].data.push_back(T.cols[ci].data[i]);
  }
  return out;
}

int main(int argc, char** argv) {
  try {
    if (argc < 2) throw std::runtime_error("need a command");
    std::string cmd = argv[1];
    auto args = parse_args(argc, argv);
    if (cmd == "datagen") {
      Tab t = gen_relation(std::stoull(need(args, "rows")), std::stoull(need(args, "nkeys")),
                           std::stoi(need(args, "payloads")), std::stoull(need(args, "seed")),
                           need(args, "kind"),
                           args.count("theta") ? std::stod(args["theta"]) : 1.0);
      colio_dump(need(args, "out"), t);
    } else if (cmd == "join") {
      Tab R = colio_load(need(args, "left"));
      Tab S = colio_load(need(args, "right"));
      std::string algo = need(args, "algo");
      Tab out = algo == "hash" ? hash_join(R, S)
                : algo == "merge" ? merge_join(R, S)
                                  : throw std::runtime_error("bad algo " + algo);
      canonicalize(out);
      colio_dump(need(args, "out"), out);
    } else if (cmd == "aggregate") {
      Tab T = colio_load(need(args, "in"));
      Tab out = aggregate(T);
      canonicalize(out);
      colio_dump(need(args, "out"), out);
    } else if (cmd == "filter") {
      Tab T = colio_load(need(args, "in"));
      Tab out = filter(T, need(args, "col"), need(args, "op"), std::stoll(need(args, "value")));
      canonicalize(out);
      colio_dump(need(args, "out"), out);
    } else if (cmd == "canon") {
      Tab T = colio_load(need(args, "in"));
      canonicalize(T);
      colio_dump(need(args, "out"), T);
    } else if (cmd == "checksum") {
      Tab T = colio_load(need(args, "in"));
      canonicalize(T);
      printf("%llu\n", (unsigned long long)checksum(T));
    } else {
      throw std::runtime_error("unknown command " + cmd);
    }
  } catch (const std::exception& e) {
    fprintf(stderr, "oracle: %s\n", e.what());
    return 1;
  }
  return 0;
}
