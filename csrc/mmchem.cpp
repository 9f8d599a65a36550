// Native chemistry kernels for the mmdti_tpu host pipeline.
//
// Implements the same spring/repulsion conformer refinement as
// mmdti_tpu/chem/conformer.py::_refine (bond springs, 1-3 angle-distance
// springs, soft nonbonded repulsion; gradient descent with momentum and a
// linearly decaying step), plus a pairwise distance matrix.  This replaces the
// role RDKit's C++ core plays in the reference host hot loop
// (/root/reference/data/conformer.py:114-145,210) with a dependency-free
// implementation callable via ctypes (see mmdti_tpu/chem/native.py).
//
// Build: make -C csrc   (produces libmmchem.so)

#include <cmath>
#include <cstring>
#include <utility>
#include <vector>

static void refine_inner(int n, float* coords,
                         int nb, const int* bond_idx, const float* bond_len,
                         int na, const int* ang_idx, const float* ang_len,
                         int nn, const int* nb_idx,
                         int iters);

// Shared term builder: adjacency + 1-3 angle-distance terms, same math as
// mmdti_tpu/chem/conformer.py::_bond_angle_terms.  mask bit0 = bonded,
// bit1 = has a 1-3 term (the 1-3 dedup intentionally does NOT exclude
// bonded pairs — a 3-ring closure bond coexists with its angle term).
// Adjacency is built in bond-insertion order, which fixes WHICH center
// emits a deduplicated 1-3 term.
static void build_angle_terms(int n, int nb, const int* bonds,
                              const double* orders, const double* bond_lens,
                              const int* flags,
                              std::vector<unsigned char>* mask_out,
                              std::vector<int>* aidx,
                              std::vector<float>* alen) {
  std::vector<std::vector<std::pair<int, int>>> adj(n);  // (neighbor, bond)
  mask_out->assign((size_t)n * n, 0);
  std::vector<unsigned char>& mask = *mask_out;
  for (int b = 0; b < nb; ++b) {
    int i = bonds[2 * b], j = bonds[2 * b + 1];
    adj[i].push_back({j, b});
    adj[j].push_back({i, b});
    mask[(size_t)i * n + j] |= 1;
    mask[(size_t)j * n + i] |= 1;
  }

  const double pi = 3.14159265358979323846;
  for (int j = 0; j < n; ++j) {
    int deg = (int)adj[j].size();
    if (deg < 2) continue;
    double maxo = 0.0;
    bool all_ge2 = true;
    for (auto& e : adj[j]) {
      double o = orders[e.second];
      if (o > maxo) maxo = o;
      if (o < 2.0) all_ge2 = false;
    }
    double theta;
    if (maxo >= 3.0 || (deg == 2 && maxo >= 2.0 && all_ge2))
      theta = pi;  // sp: linear
    else if ((flags[j] & 1) || maxo >= 2.0 || (flags[j] & 2))
      theta = 120.0 * pi / 180.0;
    else
      theta = 109.47 * pi / 180.0;
    double cos_t = std::cos(theta);
    for (int x = 0; x < deg; ++x) {
      for (int y = x + 1; y < deg; ++y) {
        int i = adj[j][x].first, k = adj[j][y].first;
        if (mask[(size_t)i * n + k] & 2) continue;
        mask[(size_t)i * n + k] |= 2;
        mask[(size_t)k * n + i] |= 2;
        double d1 = bond_lens[adj[j][x].second];
        double d2 = bond_lens[adj[j][y].second];
        double v = d1 * d1 + d2 * d2 - 2.0 * d1 * d2 * cos_t;
        if (v < 1e-6) v = 1e-6;
        aidx->push_back(i);
        aidx->push_back(k);
        alen->push_back((float)std::sqrt(v));
      }
    }
  }
}

extern "C" {

// Pair-index arrays come across a ctypes boundary: an out-of-range atom
// index would be an out-of-bounds WRITE in refine_inner (it scatters into
// grad[3*i]) and take the whole Python process down — validate at the ABI
// edge and fail soft instead (the binding falls back to the numpy path).
static bool pairs_in_range(int n, int count, const int* idx) {
  if (count > 0 && !idx) return false;
  for (int p = 0; p < 2 * count; ++p)
    if (idx[p] < 0 || idx[p] >= n) return false;
  return true;
}

// coords: [n,3] float32, updated in place. Returns 0 on success.
int mmchem_refine(int n, float* coords,
                  int nb, const int* bond_idx, const float* bond_len,
                  int na, const int* ang_idx, const float* ang_len,
                  int nn, const int* nb_idx,
                  int iters) {
  if (n <= 0 || !coords) return 1;
  if (!pairs_in_range(n, nb, bond_idx) || !pairs_in_range(n, na, ang_idx) ||
      !pairs_in_range(n, nn, nb_idx))
    return 1;
  refine_inner(n, coords, nb, bond_idx, bond_len, na, ang_idx, ang_len,
               nn, nb_idx, iters);
  return 0;
}

// ABI version of the embed/terms entries — bump when their signatures
// change; the Python binding refuses those paths on a mismatch so a
// stale MMCHEM_LIB build degrades to the refine/numpy ladder instead of
// miscalling.  v3: adds mmchem_terms (angle-term building without refine,
// feeding the accelerator-side refinement — ops/device_refine.py).
int mmchem_abi_version() { return 3; }

// Angle-term building only (same math as the mmchem_embed path below,
// shared via build_angle_terms): the device-refine provider builds bond
// terms directly from the bond list and needs no nonbonded enumeration
// (the accelerator masks nonbonded pairs from the term indices), so this
// is the only per-molecule O(deg^2) loop left on the host.  Writes at most
// cap_na terms into out_aidx [cap_na*2] / out_alen [cap_na]; returns the
// term count, or -1 on error / overflow (caller falls back to Python).
int mmchem_terms(int n, int nb, const int* bonds, const double* orders,
                 const double* bond_lens, const int* flags,
                 int cap_na, int* out_aidx, float* out_alen) {
  if (n <= 0 || !flags || cap_na < 0) return -1;
  if (nb > 0 && (!bonds || !orders || !bond_lens)) return -1;
  if (!pairs_in_range(n, nb, bonds)) return -1;
  std::vector<unsigned char> mask;
  std::vector<int> aidx;
  std::vector<float> alen;
  build_angle_terms(n, nb, bonds, orders, bond_lens, flags, &mask, &aidx, &alen);
  int na = (int)alen.size();
  if (na > cap_na) return -1;
  if (na > 0 && (!out_aidx || !out_alen)) return -1;
  std::memcpy(out_aidx, aidx.data(), sizeof(int) * 2 * na);
  std::memcpy(out_alen, alen.data(), sizeof(float) * na);
  return na;
}

// Combined entry: build the (bond, 1-3 angle-distance, nonbonded) term arrays
// from the molecular graph natively, then refine — the same term math as
// mmdti_tpu/chem/conformer.py::_build_terms, which previously ran as
// per-molecule Python loops (the O(n^2) nonbonded enumeration dominated the
// host featurization profile).
//
//   bonds:     [nb,2] int32 atom indices, insertion order (defines adjacency
//              order, which fixes WHICH center emits a deduplicated 1-3 term)
//   orders:    [nb] float64 bond orders (1.0 / 1.5 aromatic / 2.0 / 3.0)
//   bond_lens: [nb] float64 ideal bond lengths, computed by the Python
//              caller (single source: conformer._ideal_bond_length)
//   flags:     [n] int32 bitmask — bit0 aromatic atom, bit1 boron-like
//              (forces the 120-degree angle rule)
int mmchem_embed(int n, float* coords,
                 int nb, const int* bonds, const double* orders,
                 const double* bond_lens, const int* flags,
                 int iters) {
  if (n <= 0 || !coords || !flags) return 1;
  if (nb > 0 && (!bonds || !orders || !bond_lens)) return 1;
  if (!pairs_in_range(n, nb, bonds)) return 1;  // adj/mask writes index by these

  // Bond targets: double math in the 1-3 law, float32 spring targets
  // (matches the numpy path, which computes targets in double and casts the
  // term array).
  std::vector<float> blen(nb);
  for (int b = 0; b < nb; ++b) blen[b] = (float)bond_lens[b];

  std::vector<unsigned char> mask;
  std::vector<int> aidx;
  std::vector<float> alen;
  build_angle_terms(n, nb, bonds, orders, bond_lens, flags, &mask, &aidx, &alen);

  // Nonbonded: every pair with neither a bond nor a 1-3 term (includes
  // cross-fragment pairs).
  std::vector<int> nidx;
  for (int i = 0; i < n; ++i)
    for (int k = i + 1; k < n; ++k)
      if (!mask[(size_t)i * n + k]) {
        nidx.push_back(i);
        nidx.push_back(k);
      }

  refine_inner(n, coords, nb, bonds, blen.data(),
               (int)(alen.size()), aidx.data(), alen.data(),
               (int)(nidx.size() / 2), nidx.data(), iters);
  return 0;
}

}  // extern "C"

// Shared gradient-descent core (bond/angle springs + soft nonbonded
// repulsion, momentum, linearly decaying step, per-iteration recentering).
//
// The nonbonded term is pruned with a Verlet neighbor list: a pair farther
// apart than nb_floor contributes EXACTLY zero gradient, so iterating only
// the pairs within nb_floor + vmargin — with the list rebuilt before the
// accumulated worst-case drift could let an outside pair dip under the
// floor — is bit-identical to the full O(n^2) enumeration.  The list holds
// indices into the caller's pair array in ascending scan order, so the
// surviving contributions accumulate in exactly the original sequence.
// This is where the refine time went for molecules beyond ~30 heavy atoms
// (~90% of a 150-atom refine was far-pair sqrt's); a spatial-grid variant
// was tried first and measured SLOWER (per-iteration cell arrays cost more
// than the pruning saved at these n).
static void refine_inner(int n, float* coords,
                         int nb, const int* bond_idx, const float* bond_len,
                         int na, const int* ang_idx, const float* ang_len,
                         int nn, const int* nb_idx,
                         int iters) {
  std::vector<double> x(3 * n), vel(3 * n, 0.0), grad(3 * n);
  for (int i = 0; i < 3 * n; ++i) x[i] = coords[i];

  const double nb_floor = 2.2;
  const double lr0 = 0.05;

  // Verlet-list pruning for the nonbonded term: a pair farther apart than
  // nb_floor contributes EXACTLY zero gradient, so iterating only pairs
  // within nb_floor + margin (rebuilt before the accumulated worst-case
  // displacement can invalidate the list) is bit-identical to the full
  // O(n^2) enumeration — the list keeps the pair array's original order,
  // so surviving contributions accumulate in the same sequence.  Engaged
  // only for large pair counts, where the full loop dominated refine time.
  const bool use_vlist = nn >= 2048;
  const double vmargin = 1.0;
  std::vector<int> live;      // indices into nb_idx, ascending
  double travel = 1e300;      // worst-case pair-distance drift since rebuild
  if (use_vlist) live.reserve((size_t)nn / 4 + 64);

  for (int it = 0; it < iters; ++it) {
    const double lr = lr0 * (1.0 - 0.9 * (double)it / (double)iters);
    std::memset(grad.data(), 0, sizeof(double) * 3 * n);

    auto spring = [&](int i, int j, double target, double k) {
      double d0 = x[3 * i] - x[3 * j];
      double d1 = x[3 * i + 1] - x[3 * j + 1];
      double d2 = x[3 * i + 2] - x[3 * j + 2];
      double dist = std::sqrt(d0 * d0 + d1 * d1 + d2 * d2) + 1e-9;
      double c = k * 2.0 * (dist - target) / dist;
      grad[3 * i] += c * d0;     grad[3 * j] -= c * d0;
      grad[3 * i + 1] += c * d1; grad[3 * j + 1] -= c * d1;
      grad[3 * i + 2] += c * d2; grad[3 * j + 2] -= c * d2;
    };

    for (int b = 0; b < nb; ++b)
      spring(bond_idx[2 * b], bond_idx[2 * b + 1], bond_len[b], 1.0);
    for (int a = 0; a < na; ++a)
      spring(ang_idx[2 * a], ang_idx[2 * a + 1], ang_len[a], 0.6);

    auto repel = [&](int i, int j) {
      double d0 = x[3 * i] - x[3 * j];
      double d1 = x[3 * i + 1] - x[3 * j + 1];
      double d2 = x[3 * i + 2] - x[3 * j + 2];
      double dist = std::sqrt(d0 * d0 + d1 * d1 + d2 * d2) + 1e-9;
      double pen = nb_floor - dist;
      if (pen > 0.0) {
        double c = -0.3 * 2.0 * pen / dist;
        grad[3 * i] += c * d0;     grad[3 * j] -= c * d0;
        grad[3 * i + 1] += c * d1; grad[3 * j + 1] -= c * d1;
        grad[3 * i + 2] += c * d2; grad[3 * j + 2] -= c * d2;
      }
    };

    if (!use_vlist) {
      for (int p = 0; p < nn; ++p) repel(nb_idx[2 * p], nb_idx[2 * p + 1]);
    } else {
      if (travel >= vmargin) {
        // rebuild: every pair currently within nb_floor + vmargin.  A pair
        // outside the list needs its distance to shrink by > vmargin to
        // ever dip under nb_floor, and per-iteration drift is bounded by
        // 2 * max|vel| (the recenter shift cancels in pair distances).
        live.clear();
        const double keep = nb_floor + vmargin;
        const double keep2 = keep * keep;
        for (int p = 0; p < nn; ++p) {
          int i = nb_idx[2 * p], j = nb_idx[2 * p + 1];
          double d0 = x[3 * i] - x[3 * j];
          double d1 = x[3 * i + 1] - x[3 * j + 1];
          double d2 = x[3 * i + 2] - x[3 * j + 2];
          if (d0 * d0 + d1 * d1 + d2 * d2 < keep2) live.push_back(p);
        }
        travel = 0.0;
      }
      for (int p : live) repel(nb_idx[2 * p], nb_idx[2 * p + 1]);
    }

    double cx = 0.0, cy = 0.0, cz = 0.0, maxv2 = 0.0;
    for (int i = 0; i < n; ++i) {
      for (int k = 0; k < 3; ++k) {
        vel[3 * i + k] = 0.8 * vel[3 * i + k] - lr * grad[3 * i + k];
        x[3 * i + k] += vel[3 * i + k];
      }
      double v2 = vel[3 * i] * vel[3 * i] + vel[3 * i + 1] * vel[3 * i + 1]
                + vel[3 * i + 2] * vel[3 * i + 2];
      if (v2 > maxv2) maxv2 = v2;
      cx += x[3 * i]; cy += x[3 * i + 1]; cz += x[3 * i + 2];
    }
    if (use_vlist) travel += 2.0 * std::sqrt(maxv2);
    if (n > 1) {
      cx /= n; cy /= n; cz /= n;
      for (int i = 0; i < n; ++i) {
        x[3 * i] -= cx; x[3 * i + 1] -= cy; x[3 * i + 2] -= cz;
      }
    }
  }
  for (int i = 0; i < 3 * n; ++i) coords[i] = (float)x[i];
}

// out: [n,n] float32 pairwise Euclidean distances.
extern "C" void mmchem_distance_matrix(int n, const float* coords, float* out) {
  for (int i = 0; i < n; ++i) {
    out[i * n + i] = 0.0f;
    for (int j = i + 1; j < n; ++j) {
      float d0 = coords[3 * i] - coords[3 * j];
      float d1 = coords[3 * i + 1] - coords[3 * j + 1];
      float d2 = coords[3 * i + 2] - coords[3 * j + 2];
      float d = std::sqrt(d0 * d0 + d1 * d1 + d2 * d2);
      out[i * n + j] = d;
      out[j * n + i] = d;
    }
  }
}
