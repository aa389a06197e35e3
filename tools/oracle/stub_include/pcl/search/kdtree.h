#pragma once
#include <memory>

#include "../point_types.h"

namespace pcl {
namespace search {

template <typename PointT>
class KdTree {
 public:
  using Ptr = std::shared_ptr<KdTree<PointT>>;
  void setInputCloud(typename PointCloud<PointT>::Ptr) {}
};

}  // namespace search
}  // namespace pcl
