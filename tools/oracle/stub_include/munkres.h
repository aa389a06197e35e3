// Minimal munkres-cpp shim for the reference oracle build.  Same contract as
// the library the reference links (`libmunkres.a`, CMakeLists.txt:31-34):
// Matrix<T>(rows, cols) with (r,c) accessors, and Munkres<T>::solve() which
// rewrites the matrix in place -- assigned pairs become 0, everything else
// -1.  The solve itself is an exact Jonker-Volgenant shortest augmenting
// path (optimal min-cost assignment over min(rows, cols) pairs, as the
// Hungarian library computes).
#pragma once
#include <algorithm>
#include <limits>
#include <vector>

template <typename T>
class Matrix {
 public:
  Matrix(std::size_t rows, std::size_t cols)
      : rows_(rows), cols_(cols), data_(rows * cols, T(0)) {}
  T &operator()(std::size_t r, std::size_t c) { return data_[r * cols_ + c]; }
  const T &operator()(std::size_t r, std::size_t c) const {
    return data_[r * cols_ + c];
  }
  std::size_t rows() const { return rows_; }
  std::size_t columns() const { return cols_; }

 private:
  std::size_t rows_, cols_;
  std::vector<T> data_;
};

template <typename T>
class Munkres {
 public:
  void solve(Matrix<T> &m) {
    const int R = (int)m.rows(), C = (int)m.columns();
    const int n = std::max(R, C);
    const double BIG = 1e9;
    // square cost with dummy padding above the real range
    double maxc = 1.0;
    for (int r = 0; r < R; ++r)
      for (int c = 0; c < C; ++c) maxc = std::max(maxc, (double)m(r, c));
    std::vector<std::vector<double>> a(n + 1, std::vector<double>(n + 1, 0.0));
    for (int r = 1; r <= n; ++r)
      for (int c = 1; c <= n; ++c)
        a[r][c] = (r <= R && c <= C) ? (double)m(r - 1, c - 1) : maxc * 2 + 1;

    // e-maxx Jonker-Volgenant
    std::vector<double> u(n + 1, 0), v(n + 1, 0);
    std::vector<int> p(n + 1, 0), way(n + 1, 0);
    for (int i = 1; i <= n; ++i) {
      p[0] = i;
      int j0 = 0;
      std::vector<double> minv(n + 1, BIG);
      std::vector<char> used(n + 1, 0);
      do {
        used[j0] = 1;
        int i0 = p[j0], j1 = 0;
        double delta = BIG;
        for (int j = 1; j <= n; ++j)
          if (!used[j]) {
            double cur = a[i0][j] - u[i0] - v[j];
            if (cur < minv[j]) {
              minv[j] = cur;
              way[j] = j0;
            }
            if (minv[j] < delta) {
              delta = minv[j];
              j1 = j;
            }
          }
        for (int j = 0; j <= n; ++j) {
          if (used[j]) {
            u[p[j]] += delta;
            v[j] -= delta;
          } else {
            minv[j] -= delta;
          }
        }
        j0 = j1;
      } while (p[j0] != 0);
      do {
        int j1 = way[j0];
        p[j0] = p[j1];
        j0 = j1;
      } while (j0);
    }

    // rewrite: assigned real pairs -> 0, everything else -> -1
    std::vector<int> col_of_row(R, -1);
    for (int j = 1; j <= n; ++j)
      if (p[j] >= 1 && p[j] <= R && j <= C) col_of_row[p[j] - 1] = j - 1;
    for (int r = 0; r < R; ++r)
      for (int c = 0; c < C; ++c) m(r, c) = (col_of_row[r] == c) ? T(0) : T(-1);
  }
};
