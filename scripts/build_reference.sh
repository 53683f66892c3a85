#!/bin/bash
# Build the ACTUAL reference binary from /root/reference sources, outside
# the repo (into /tmp/refbuild).  BASELINE.md originally recorded this as
# impossible (no Eigen/Boost in the image); in fact Eigen ships inside
# tensorflow's bundled headers, OpenCV4 C++ dev headers are installed, and
# Sophus is vendored in the reference tree.  Patches below are purely
# mechanical build fixes — the tracking/optimizer code is untouched:
#   - boost::filesystem (only used for 3 create_directory calls in
#     iowrapperRGBD.cpp) -> std::filesystem, C++17
#   - OpenCV 3 constant names -> OpenCV 4 (CV_DIST_L2 -> cv::DIST_L2 etc.)
#   - C++17 enforces allocator/value_type agreement on two std::vector
#     declarations (aligned_allocator<Matrix4f> -> <element type>)
#   - RELEASE build (the shipped CMakeLists pins DEBUG), keeping the
#     reference's own -O3 -msse3 -msse4.1 -mavx2 -fopenmp flags
# Viewer/sensor stacks are configured off (Pangolin/librealsense/libuvc/
# OpenNI are genuinely absent); the dataset replay path is complete.
set -euo pipefail

EIGEN=/opt/venv/lib/python3.12/site-packages/tensorflow/include
DST=/tmp/refbuild

rm -rf "$DST"
cp -r /root/reference "$DST"
chmod -R u+w "$DST"
cd "$DST"

sed -i 's/#include <boost\/filesystem.hpp>/#include <filesystem>/; s/boost::filesystem::create_directory/std::filesystem::create_directory/g' io/iowrapperRGBD.cpp
sed -i 's/CV_LOAD_IMAGE_UNCHANGED/cv::IMREAD_UNCHANGED/' io/iowrapperRGBD.cpp
sed -i 's/find_package(Boost COMPONENTS system filesystem REQUIRED)/#boost replaced by std::filesystem/; s/list(APPEND LIBS ${Boost_FILESYSTEM_LIBRARY} ${Boost_SYSTEM_LIBRARY})//' CMakeLists.txt
sed -i 's/find_package(OpenCV 3 REQUIRED/find_package(OpenCV 4 REQUIRED/' CMakeLists.txt
sed -i 's/-std=c++11/-std=c++17/' CMakeLists.txt
sed -i 's/SET(CMAKE_BUILD_TYPE DEBUG)/SET(CMAKE_BUILD_TYPE RELEASE)/' CMakeLists.txt
sed -i "s|find_package(Eigen3 REQUIRED)|set(EIGEN3_INCLUDE_DIRS \"$EIGEN\")|" CMakeLists.txt
sed -i 's/std::__cxx11::string/std::string/' system/system.h
sed -i 's/std::vector<Pose,Eigen::aligned_allocator<Eigen::Matrix4f>>/std::vector<Pose,Eigen::aligned_allocator<Pose>>/' system/system.h
sed -i '123s/Eigen::aligned_allocator<Eigen::Matrix4f>/Eigen::aligned_allocator<std::tuple<Eigen::Matrix4f,bool>>/' system/system.cpp
sed -i 's/CV_BGRA2GRAY/cv::COLOR_BGRA2GRAY/g; s/CV_BGR2GRAY/cv::COLOR_BGR2GRAY/g; s/CV_RGB2GRAY/cv::COLOR_RGB2GRAY/g; s/CV_INTER_LINEAR/cv::INTER_LINEAR/g; s/CV_DIST_L2/cv::DIST_L2/g; s/CV_DIST_MASK_PRECISE/cv::DIST_MASK_PRECISE/g' datastructures/imgpyramidrgbd.cpp io/iowrapperRGBD.cpp system/*.cpp main.cpp

mkdir -p build && cd build
cmake .. -DWITH_PANGOLIN_VIEWER=OFF -DWITH_REALSENSE=OFF \
  -DWITH_ORBBEC_FFMPEG=OFF -DWITH_ORBBEC_UVC=OFF -DWITH_ORBBEC_OPENNI=OFF \
  > cmake.log 2>&1
make -j4 2>&1 | tail -2
ls -la "$DST/build/REVO"
