// Minimal Euclidean-clustering shim: same contract as PCL's
// EuclideanClusterExtraction (connected components under a distance
// tolerance with [min,max] size bounds), O(n^2) BFS -- fine at the
// reference's <=5000-point input budget.
#pragma once
#include <cstddef>
#include <queue>
#include <vector>

#include "../point_types.h"
#include "../search/kdtree.h"

namespace pcl {

template <typename PointT>
class EuclideanClusterExtraction {
 public:
  void setClusterTolerance(double tol) { tol_ = tol; }
  void setMinClusterSize(int n) { min_size_ = n; }
  void setMaxClusterSize(int n) { max_size_ = n; }
  void setSearchMethod(typename search::KdTree<PointT>::Ptr) {}
  void setInputCloud(typename PointCloud<PointT>::Ptr cloud) { cloud_ = cloud; }

  void extract(std::vector<PointIndices> &clusters) {
    clusters.clear();
    if (!cloud_) return;
    const auto &pts = cloud_->points;
    const std::size_t n = pts.size();
    const float tol2 = (float)(tol_ * tol_);
    std::vector<char> visited(n, 0);
    for (std::size_t seed = 0; seed < n; ++seed) {
      if (visited[seed]) continue;
      PointIndices comp;
      std::queue<std::size_t> q;
      q.push(seed);
      visited[seed] = 1;
      while (!q.empty()) {
        std::size_t i = q.front();
        q.pop();
        comp.indices.push_back((int)i);
        for (std::size_t j = 0; j < n; ++j) {
          if (visited[j]) continue;
          float dx = pts[i].x - pts[j].x;
          float dy = pts[i].y - pts[j].y;
          float dz = pts[i].z - pts[j].z;
          if (dx * dx + dy * dy + dz * dz <= tol2) {
            visited[j] = 1;
            q.push(j);
          }
        }
      }
      if ((int)comp.indices.size() >= min_size_ &&
          (int)comp.indices.size() <= max_size_) {
        clusters.push_back(std::move(comp));
      }
    }
  }

 private:
  double tol_ = 0.0;
  int min_size_ = 1, max_size_ = 1 << 30;
  typename PointCloud<PointT>::Ptr cloud_;
};

}  // namespace pcl
