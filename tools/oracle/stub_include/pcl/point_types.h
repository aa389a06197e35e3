// Minimal PCL shim for the reference oracle build: just the point records
// and the PointCloud container surface the reference headers touch.
#pragma once
#include <memory>
#include <vector>

namespace pcl {

struct PointXYZ {
  float x = 0.f, y = 0.f, z = 0.f;
};

struct PointXYZINormal {
  float x = 0.f, y = 0.f, z = 0.f;
  float intensity = 0.f;
  float normal_x = 0.f, normal_y = 0.f, normal_z = 0.f;
};

struct PointIndices {
  std::vector<int> indices;
};

template <typename PointT>
class PointCloud {
 public:
  using Ptr = std::shared_ptr<PointCloud<PointT>>;
  std::vector<PointT> points;
  unsigned width = 0, height = 1;

  void push_back(const PointT &p) {
    points.push_back(p);
    width = (unsigned)points.size();
  }
  void clear() {
    points.clear();
    width = 0;
  }
  bool empty() const { return points.empty(); }
  std::size_t size() const { return points.size(); }
  PointT &operator[](std::size_t i) { return points[i]; }
  const PointT &operator[](std::size_t i) const { return points[i]; }
  auto begin() { return points.begin(); }
  auto end() { return points.end(); }
  auto begin() const { return points.begin(); }
  auto end() const { return points.end(); }
};

}  // namespace pcl
