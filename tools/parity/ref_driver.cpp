// Head-to-head parity driver for the reference UcoSLAM library.
//
// Links the UNMODIFIED reference `libucoslam.so` (built out-of-tree from
// /root/reference) and runs its two-pass evaluation protocol
// (reference tests/test_sequence.cpp:157-420: pass 1 SLAM +
// globalOptimization, pass 2 MODE_LOCALIZATION re-run) over a TUM-style
// image directory, writing TUM-format trajectories that
// apps/compare_logs.py scores with the same Horn-1987 ATE semantics as
// reference tests/logtools.cpp:153,291.
//
// Usage:
//   ref_driver <dataset_root> <camera.yml> <out_prefix>
//       [-params params.yml] [-voc vocab.fbow] [-maxframes N]
//       [-onepass] [-nomarkers|-markers] [-aruco-size S]
//
// Outputs: <out_prefix>.pass1.tum, <out_prefix>.pass2.tum,
//          <out_prefix>.stats (json: fps, frames tracked per pass).
#include <algorithm>
#include <chrono>
#include <cstdio>
#include <fstream>
#include <iostream>
#include <limits>
#include <sstream>
#include <string>
#include <vector>

#include <opencv2/core.hpp>
#include <opencv2/imgcodecs.hpp>

#include "ucoslam.h"

struct Item {
    double stamp;
    std::string path;
};

static std::vector<Item> readTumList(const std::string &root,
                                     const std::string &list = "rgb.txt") {
    std::vector<Item> items;
    std::ifstream f(root + "/" + list);
    if (!f) throw std::runtime_error("cannot open " + root + "/" + list);
    std::string line;
    while (std::getline(f, line)) {
        if (line.empty() || line[0] == '#') continue;
        std::istringstream ss(line);
        Item it;
        ss >> it.stamp >> it.path;
        if (!it.path.empty()) {
            it.path = root + "/" + it.path;
            items.push_back(it);
        }
    }
    return items;
}

// EuRoC mav0/camN/data.csv: "timestamp_ns,filename"
static std::vector<Item> readEurocList(const std::string &root, int cam,
                                       std::vector<std::string> *rightPaths) {
    std::vector<Item> items;
    std::string base = root + "/mav0/cam" + std::to_string(cam);
    std::ifstream f(base + "/data.csv");
    if (!f) throw std::runtime_error("cannot open " + base + "/data.csv");
    std::string line;
    while (std::getline(f, line)) {
        if (line.empty() || line[0] == '#') continue;
        auto comma = line.find(',');
        if (comma == std::string::npos) continue;
        Item it;
        it.stamp = std::stod(line.substr(0, comma)) * 1e-9;
        std::string fn = line.substr(comma + 1);
        while (!fn.empty() && (fn.back() == '\r' || fn.back() == '\n')) fn.pop_back();
        it.path = base + "/data/" + fn;
        items.push_back(it);
        if (rightPaths) rightPaths->push_back(root + "/mav0/cam1/data/" + fn);
    }
    return items;
}

// pose_f2g (world->camera) -> TUM line "stamp cx cy cz qx qy qz qw"
// (camera center + camera-to-world quaternion), matching
// ucoslam_tpu.io.datasets.save_trajectory_tum.
static void writeTumLine(std::ofstream &out, double stamp, const cv::Mat &pose) {
    cv::Mat P;
    pose.convertTo(P, CV_64F);
    cv::Mat R = P(cv::Rect(0, 0, 3, 3));
    cv::Mat t = P(cv::Rect(3, 0, 1, 3));
    cv::Mat Rt = R.t();
    cv::Mat c = -Rt * t;
    // quaternion of Rt
    double m00 = Rt.at<double>(0, 0), m01 = Rt.at<double>(0, 1), m02 = Rt.at<double>(0, 2);
    double m10 = Rt.at<double>(1, 0), m11 = Rt.at<double>(1, 1), m12 = Rt.at<double>(1, 2);
    double m20 = Rt.at<double>(2, 0), m21 = Rt.at<double>(2, 1), m22 = Rt.at<double>(2, 2);
    double qw, qx, qy, qz;
    double tr = m00 + m11 + m22;
    if (tr > 0) {
        double s = sqrt(tr + 1.0) * 2;
        qw = 0.25 * s;
        qx = (m21 - m12) / s;
        qy = (m02 - m20) / s;
        qz = (m10 - m01) / s;
    } else if (m00 > m11 && m00 > m22) {
        double s = sqrt(1.0 + m00 - m11 - m22) * 2;
        qw = (m21 - m12) / s;
        qx = 0.25 * s;
        qy = (m01 + m10) / s;
        qz = (m02 + m20) / s;
    } else if (m11 > m22) {
        double s = sqrt(1.0 + m11 - m00 - m22) * 2;
        qw = (m02 - m20) / s;
        qx = (m01 + m10) / s;
        qy = 0.25 * s;
        qz = (m12 + m21) / s;
    } else {
        double s = sqrt(1.0 + m22 - m00 - m11) * 2;
        qw = (m10 - m01) / s;
        qx = (m02 + m20) / s;
        qy = (m12 + m21) / s;
        qz = 0.25 * s;
    }
    char buf[256];
    snprintf(buf, sizeof(buf), "%.6f %.6f %.6f %.6f %.6f %.6f %.6f %.6f\n", stamp,
             c.at<double>(0), c.at<double>(1), c.at<double>(2), qx, qy, qz, qw);
    out << buf;
}

static bool hasFlag(int argc, char **argv, const std::string &f) {
    for (int i = 0; i < argc; i++)
        if (f == argv[i]) return true;
    return false;
}
static std::string getOpt(int argc, char **argv, const std::string &f, const std::string &dflt) {
    for (int i = 0; i < argc - 1; i++)
        if (f == argv[i]) return argv[i + 1];
    return dflt;
}

int main(int argc, char **argv) {
    if (argc < 4) {
        std::cerr << "usage: ref_driver <dataset_root> <camera.yml> <out_prefix> "
                     "[-params p.yml] [-voc v.fbow] [-maxframes N] [-onepass] "
                     "[-markers] [-aruco-size S]\n";
        return 1;
    }
    std::string root = argv[1], camyml = argv[2], outprefix = argv[3];
    bool stereo = hasFlag(argc, argv, "-stereo");
    bool rgbd = hasFlag(argc, argv, "-rgbd");
    bool recovery = hasFlag(argc, argv, "-recovery");
    std::vector<std::string> rightPaths;
    std::vector<Item> items = stereo ? readEurocList(root, 0, &rightPaths)
                                     : readTumList(root);
    std::vector<Item> depthItems;
    if (rgbd) depthItems = readTumList(root, "depth.txt");
    int maxframes = std::stoi(getOpt(argc, argv, "-maxframes", "1000000"));
    if ((int)items.size() > maxframes) items.resize(maxframes);

    ucoslam::ImageParams ip;
    ip.readFromXMLFile(camyml);

    ucoslam::Params params;
    int dbg = std::stoi(getOpt(argc, argv, "-debug", "0"));
    std::string pfile = getOpt(argc, argv, "-params", "");
    if (!pfile.empty()) params.readFromYMLFile(pfile);
    params.runSequential = true;  // deterministic mode (README.txt:16)
    params.detectMarkers = hasFlag(argc, argv, "-markers");
    if (params.detectMarkers)
        params.aruco_markerSize = std::stof(getOpt(argc, argv, "-aruco-size", "0.5"));

    auto themap = std::make_shared<ucoslam::Map>();
    // heap-owned so pass 1's instance is destroyed before pass 2's is
    // created (the reference keeps static/global state; two live UcoSlam
    // objects on one map crash — test_sequence.cpp also replaces its
    // shared_ptr, destroying the first)
    auto slam_p = std::make_unique<ucoslam::UcoSlam>();
    ucoslam::UcoSlam &slam = *slam_p;
    if (dbg) slam.setDebugLevel(dbg);
    std::string voc = getOpt(argc, argv, "-voc", "");
    slam.setParams(themap, params, voc);

    std::ofstream p1(outprefix + ".pass1.tum");
    int tracked1 = 0;
    // reference harness recovery protocol (tests/test_sequence.cpp:255-
    // 300): on loss after tracking started — save evidence, rewind 15
    // frames, resetTracker, tighten KF params until 5 frames past the
    // loss point; restore params on re-acquire or on give-up.
    bool trackingStarted = false;
    // a recovery rewind re-processes frames [i-15, i]; without this guard
    // the re-tracked frames would be appended to pass1.tum again (duplicate
    // stamps) and re-counted in tracked1, inflating the reference's stats
    int maxLogged = -1;
    int recoveryLostFrame = std::numeric_limits<int>::max();
    float normalKFMinConfidence = params.KFMinConfidence;
    float normalKFCulling = params.KFCulling;
    float normalProjDistThr = params.projDistThr;
    int nRecoveries = 0;
    auto t0 = std::chrono::steady_clock::now();
    for (int i = 0; i < (int)items.size(); i++) {
        cv::Mat img = cv::imread(items[i].path, cv::IMREAD_GRAYSCALE);
        if (img.empty()) throw std::runtime_error("bad image " + items[i].path);
        cv::Mat pose;
        if (stereo) {
            cv::Mat right = cv::imread(rightPaths[i], cv::IMREAD_GRAYSCALE);
            pose = slam.processStereo(img, right, ip, (uint32_t)i);
        } else if (rgbd) {
            cv::Mat depth = cv::imread(depthItems[i].path, cv::IMREAD_UNCHANGED);
            pose = slam.processRGBD(img, depth, ip, (uint32_t)i);
        } else {
            pose = slam.process(img, ip, (uint32_t)i);
        }
        if (!pose.empty()) {
            if (i > maxLogged) {
                tracked1++;
                writeTumLine(p1, items[i].stamp, pose);
                maxLogged = i;
            }
            trackingStarted = trackingStarted || themap->keyframes.size() >= 5;
            if (i >= recoveryLostFrame) {
                slam.getParams().KFMinConfidence = normalKFMinConfidence;
                slam.getParams().KFCulling = normalKFCulling;
                slam.getParams().projDistThr = normalProjDistThr;
                recoveryLostFrame = std::numeric_limits<int>::max();
            }
        } else if (recovery && trackingStarted) {
            if (recoveryLostFrame == std::numeric_limits<int>::max()) {
                recoveryLostFrame = i + 5;
                nRecoveries++;
                int back = std::max(i - 15, 0);
                slam.waitForFinished();
                slam.resetTracker();
                slam.getParams().KFMinConfidence = 0.9f;
                slam.getParams().KFCulling = 0.9f;
                slam.getParams().projDistThr = 1.5f * normalProjDistThr;
                i = back - 1;  // loop ++ lands on `back`
            } else if (i >= recoveryLostFrame) {
                slam.getParams().KFMinConfidence = normalKFMinConfidence;
                slam.getParams().KFCulling = normalKFCulling;
                slam.getParams().projDistThr = normalProjDistThr;
                recoveryLostFrame = std::numeric_limits<int>::max();
                trackingStarted = false;
            }
        }
    }
    slam.waitForFinished();
    if (themap->keyframes.size() > 0) slam.globalOptimization();
    std::string signature = slam.getSignatureStr();
    auto t1 = std::chrono::steady_clock::now();
    double dt1 = std::chrono::duration<double>(t1 - t0).count();
    p1.close();

    int tracked2 = 0;
    double dt2 = 0;
    if (!hasFlag(argc, argv, "-onepass") && themap->keyframes.size() > 0) {
        // pass 2: localization-only over the same images with a FRESH
        // UcoSlam on the built map — exactly the reference harness's
        // protocol (tests/test_sequence.cpp:356-359 constructs a new
        // UcoSlam, setParams(TheMap, params), setMode(MODE_LOCALIZATION))
        if (dbg) std::cerr << "[drv] destroying pass-1 instance\n";
        slam_p.reset();
        if (dbg) std::cerr << "[drv] constructing pass-2 instance\n";
        auto slam2 = std::make_unique<ucoslam::UcoSlam>();
        slam2->setParams(themap, params, voc);
        if (dbg) std::cerr << "[drv] setParams done\n";
        slam2->setMode(ucoslam::MODE_LOCALIZATION);
        if (dbg) std::cerr << "[drv] setMode done\n";
        std::ofstream p2(outprefix + ".pass2.tum");
        auto t2 = std::chrono::steady_clock::now();
        for (size_t i = 0; i < items.size(); i++) {
            cv::Mat img = cv::imread(items[i].path, cv::IMREAD_GRAYSCALE);
            cv::Mat pose;
            if (stereo) {
                cv::Mat right = cv::imread(rightPaths[i], cv::IMREAD_GRAYSCALE);
                pose = slam2->processStereo(img, right, ip, (uint32_t)i);
            } else if (rgbd) {
                cv::Mat depth = cv::imread(depthItems[i].path, cv::IMREAD_UNCHANGED);
                pose = slam2->processRGBD(img, depth, ip, (uint32_t)i);
            } else {
                pose = slam2->process(img, ip, (uint32_t)i);
            }
            if (dbg) std::cerr << "[drv] pass2 frame " << i << " tracked=" << !pose.empty() << "\n";
            if (!pose.empty()) {
                tracked2++;
                writeTumLine(p2, items[i].stamp, pose);
            }
        }
        auto t3 = std::chrono::steady_clock::now();
        dt2 = std::chrono::duration<double>(t3 - t2).count();
    }

    std::ofstream st(outprefix + ".stats");
    st << "{\"frames\": " << items.size() << ", \"tracked_pass1\": " << tracked1
       << ", \"fps_pass1\": " << items.size() / std::max(dt1, 1e-9)
       << ", \"tracked_pass2\": " << tracked2
       << ", \"fps_pass2\": " << (dt2 > 0 ? items.size() / dt2 : 0.0)
       << ", \"n_map_points\": " << themap->map_points.size()
       << ", \"n_keyframes\": " << themap->keyframes.size()
       << ", \"signature\": \"" << signature << "\"}\n";
    std::cout << "pass1 tracked " << tracked1 << "/" << items.size() << " fps=" << items.size() / dt1
              << "; pass2 tracked " << tracked2 << std::endl;
    return 0;
}
