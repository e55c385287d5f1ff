// TEST-ORACLE wrapper — NOT production code.
//
// Compiles the REFERENCE front end (/root/reference/src/ORBextractor.cpp,
// read-only, compiled in place via the build command in orb_oracle.py) behind
// a C ABI so the test suite can diff our TPU extractor against the actual
// reference code running on the same pixels. This is the only piece of
// reference code this repo ever executes, and it is used strictly as a parity
// instrument (tests/test_orb_oracle.py); nothing from it ships in the package
// compute path.
//
// Reference entry point wrapped: ORBextractor::operator()
// (/root/reference/src/ORBextractor.cpp:1051-1112 — pyramid -> FAST retry ->
// quad-tree -> budget split -> IC angle -> Gaussian blur -> rBRIEF).

#include <opencv2/opencv.hpp>
#include <cstring>
#include <vector>
#include <algorithm>

#include "myslam/ORBextractor.h"  // reference header, via -I/root/reference/include

extern "C" {

// Extract ORB features with the reference extractor.
//   img       : rows*cols u8 grayscale, row-major
//   kp_out    : [max_out, 5] float32 — x, y, angle_deg, octave, response
//   desc_out  : [max_out, 32] u8 — rBRIEF descriptors
// Returns number of keypoints written (<= max_out), or -1 on error.
int orb_oracle_extract(const unsigned char* img, int rows, int cols,
                       int nfeatures, float scale_factor, int nlevels,
                       int ini_th, int min_th,
                       float* kp_out, unsigned char* desc_out, int max_out) {
    try {
        cv::Mat image(rows, cols, CV_8UC1, const_cast<unsigned char*>(img));
        ORB_SLAM2::ORBextractor ext(nfeatures, scale_factor, nlevels, ini_th, min_th);
        std::vector<cv::KeyPoint> kps;
        cv::Mat desc;
        ext(image, cv::Mat(), kps, desc);
        int n = std::min(static_cast<int>(kps.size()), max_out);
        for (int i = 0; i < n; ++i) {
            kp_out[i * 5 + 0] = kps[i].pt.x;
            kp_out[i * 5 + 1] = kps[i].pt.y;
            kp_out[i * 5 + 2] = kps[i].angle;
            kp_out[i * 5 + 3] = static_cast<float>(kps[i].octave);
            kp_out[i * 5 + 4] = kps[i].response;
            std::memcpy(desc_out + i * 32, desc.ptr(i), 32);
        }
        return n;
    } catch (...) {
        return -1;
    }
}

// Expose the reference pyramid alone (ComputePyramid is protected; operator()
// fills mvImagePyramid as a public member). level_out must hold the level-L
// image at ceil(rows/1.2^L) x ceil(cols/1.2^L) — caller passes the exact
// buffer size; we return the actual rows/cols written.
int orb_oracle_pyramid_level(const unsigned char* img, int rows, int cols,
                             int nlevels, float scale_factor, int level,
                             unsigned char* level_out, int* out_rows, int* out_cols) {
    try {
        cv::Mat image(rows, cols, CV_8UC1, const_cast<unsigned char*>(img));
        ORB_SLAM2::ORBextractor ext(1000, scale_factor, nlevels, 20, 7);
        std::vector<cv::KeyPoint> kps;
        cv::Mat desc;
        ext(image, cv::Mat(), kps, desc);  // fills mvImagePyramid
        if (level < 0 || level >= nlevels) return -1;
        cv::Mat lv = ext.mvImagePyramid[level];
        *out_rows = lv.rows;
        *out_cols = lv.cols;
        for (int r = 0; r < lv.rows; ++r)
            std::memcpy(level_out + r * lv.cols, lv.ptr(r), lv.cols);
        return 0;
    } catch (...) {
        return -1;
    }
}

namespace {
// Expose the protected quad-tree for direct parity testing.
class OracleExtractor : public ORB_SLAM2::ORBextractor {
  public:
    using ORB_SLAM2::ORBextractor::ORBextractor;
    using ORB_SLAM2::ORBextractor::DistributeOctTree;
};
}  // namespace

// Run the reference DistributeOctTree on explicit candidates.
//   cand: [n,3] float32 — x, y (relative to the min corner), response
//   keep_out: [max_out] int32 — indices of retained candidates (matched
//   back by exact (x, y); candidates must be unique positions).
// Returns number kept, or -1.
int orb_oracle_distribute(const float* cand, int n,
                          int min_x, int max_x, int min_y, int max_y,
                          int target, int* keep_out, int max_out) {
    try {
        std::vector<cv::KeyPoint> keys(n);
        for (int i = 0; i < n; ++i) {
            keys[i].pt = cv::Point2f(cand[i * 3 + 0], cand[i * 3 + 1]);
            keys[i].response = cand[i * 3 + 2];
            keys[i].class_id = i;
        }
        OracleExtractor ext(1000, 1.2f, 8, 20, 7);
        std::vector<cv::KeyPoint> out =
            ext.DistributeOctTree(keys, min_x, max_x, min_y, max_y, target, 0);
        int m = std::min(static_cast<int>(out.size()), max_out);
        for (int i = 0; i < m; ++i) keep_out[i] = out[i].class_id;
        return m;
    } catch (...) {
        return -1;
    }
}

// The exact GaussianBlur the reference applies before rBRIEF sampling
// (ORBextractor.cpp:1094) through the SAME linked OpenCV: u8 in/out.
int orb_oracle_blur_u8(const unsigned char* img, int rows, int cols,
                       unsigned char* out) {
    try {
        cv::Mat image(rows, cols, CV_8UC1, const_cast<unsigned char*>(img));
        cv::Mat dst(rows, cols, CV_8UC1, out);
        cv::GaussianBlur(image, dst, cv::Size(7, 7), 2, 2, cv::BORDER_REFLECT_101);
        return 0;
    } catch (...) {
        return -1;
    }
}

}  // extern "C"
