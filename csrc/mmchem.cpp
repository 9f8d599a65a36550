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
#include <vector>

extern "C" {

// coords: [n,3] float32, updated in place. Returns 0 on success.
int mmchem_refine(int n, float* coords,
                  int nb, const int* bond_idx, const float* bond_len,
                  int na, const int* ang_idx, const float* ang_len,
                  int nn, const int* nb_idx,
                  int iters) {
  if (n <= 0 || !coords) return 1;
  std::vector<double> x(3 * n), vel(3 * n, 0.0), grad(3 * n);
  for (int i = 0; i < 3 * n; ++i) x[i] = coords[i];

  const double nb_floor = 2.2;
  const double lr0 = 0.05;

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

    for (int p = 0; p < nn; ++p) {
      int i = nb_idx[2 * p], j = nb_idx[2 * p + 1];
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
    }

    double cx = 0.0, cy = 0.0, cz = 0.0;
    for (int i = 0; i < n; ++i) {
      for (int k = 0; k < 3; ++k) {
        vel[3 * i + k] = 0.8 * vel[3 * i + k] - lr * grad[3 * i + k];
        x[3 * i + k] += vel[3 * i + k];
      }
      cx += x[3 * i]; cy += x[3 * i + 1]; cz += x[3 * i + 2];
    }
    if (n > 1) {
      cx /= n; cy /= n; cz /= n;
      for (int i = 0; i < n; ++i) {
        x[3 * i] -= cx; x[3 * i + 1] -= cy; x[3 * i + 2] -= cz;
      }
    }
  }
  for (int i = 0; i < 3 * n; ++i) coords[i] = (float)x[i];
  return 0;
}

// out: [n,n] float32 pairwise Euclidean distances.
void mmchem_distance_matrix(int n, const float* coords, float* out) {
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

}  // extern "C"
