// Single-core reference-class MD baseline for the bench denominator.
//
// The reference publishes no throughput numbers (SURVEY.md §6), so bench.py
// needs a defensible single-node ESPResSo++-class denominator.  This is a
// straightforward C++ cell-list + Verlet-list MD engine running the SAME
// workload class as the bench melt: LJ eps=0.25 sigma=1 rc=2.5 at density
// 0.27, harmonic trimer bonds (K=60, r0=0.97) AND angles (K=2.5,
// theta0=180), intra-molecular exclusions filtered at Verlet build (the
// reference's VerletList takes the nrexcl-derived exclusion list,
// ref src/start_simulation.py:193-197), Langevin NVT, dt=0.0025 — the
// per-core throughput of a competently written native engine, measured on
// THIS machine, scaled by the reference's own single-node deployment
// (20 MPI ranks, examples/atrp_lj/p2ccg.pbs) in bench.py.
//
// Modes (3rd arg):
//   (default) "lj"  analytic LJ pair forces — the atrp_lj workload class
//   "tab"           per-type-pair TABULATED pair forces (linear E/F
//                   interpolation at the reference's source resolution
//                   dr=0.002, the espressopp Tabulated itype-1 cost model)
//                   — the rim135/dacron workload class, so the tabulated
//                   bench legs divide by a features-matched denominator
//
// Usage: baseline_md <n_particles> <n_steps> [lj|tab]  -> prints "pps <v>"
//
// Build: g++ -O3 -march=native -o baseline_md baseline_md.cpp

#include <chrono>
#include <cmath>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <random>
#include <vector>

struct V3 { float x, y, z; };

int main(int argc, char **argv) {
    int n = argc > 1 ? atoi(argv[1]) : 9999;
    int steps = argc > 2 ? atoi(argv[2]) : 400;
    bool tab = argc > 3 && strcmp(argv[3], "tab") == 0;
    n -= n % 3;                                  // trimers
    const float density = 0.27f, eps = 0.25f, sig = 1.0f;
    const float rc = 2.5f, skin = 0.4f, dt = 0.0025f, kT = 1.0f, gamma_ = 1.0f;
    const float box = cbrtf(n / density);
    const float rc2 = rc * rc, rcs = rc + skin, rcs2 = rcs * rcs;
    const float kbond = 60.0f, r0 = 0.97f;
    const float kang = 2.5f, th0 = (float)M_PI;  // MA-ML-MA harmonic angle

    std::mt19937 rng(42);
    std::uniform_real_distribution<float> U(0.f, 1.f);
    std::normal_distribution<float> G(0.f, 1.f);

    std::vector<V3> pos(n), vel(n), frc(n);
    for (int m = 0; m < n / 3; m++) {           // random trimer placement
        V3 c = {U(rng) * box, U(rng) * box, U(rng) * box};
        V3 u = {G(rng), G(rng), G(rng)};
        float nu = sqrtf(u.x * u.x + u.y * u.y + u.z * u.z) + 1e-12f;
        u = {u.x / nu * r0, u.y / nu * r0, u.z / nu * r0};
        pos[3 * m] = {c.x - u.x, c.y - u.y, c.z - u.z};
        pos[3 * m + 1] = c;
        pos[3 * m + 2] = {c.x + u.x, c.y + u.y, c.z + u.z};
        for (int k = 0; k < 3; k++)
            vel[3 * m + k] = {G(rng), G(rng), G(rng)};
    }
    auto wrap = [&](float v) { v = fmodf(v, box); return v < 0 ? v + box : v; };
    for (auto &p : pos) { p.x = wrap(p.x); p.y = wrap(p.y); p.z = wrap(p.z); }

    // tabulated mode: per-type-pair E/F tables at the reference examples'
    // source resolution (rim135 tables: dr = 0.002), looked up by the
    // (ti, tj) pair id and linearly interpolated per pair — the itype-1
    // Tabulated cost model.  3 particle types (trimer position), 9 tables.
    const float tdr = 0.002f, tr0 = tdr;
    const int tlen = (int)(3.0f / tdr);
    std::vector<std::vector<float>> tabF(9), tabE(9);
    if (tab) {
        for (int t = 0; t < 9; t++) {
            tabF[t].resize(tlen); tabE[t].resize(tlen);
            for (int k = 0; k < tlen; k++) {
                float r = tr0 + k * tdr;
                float sr6 = powf(sig / r, 6.f);
                tabE[t][k] = 4.f * eps * (sr6 * sr6 - sr6);
                tabF[t][k] = 24.f * eps * (2.f * sr6 * sr6 - sr6) / r;
            }
        }
    }

    // cell list
    int nc = (int)floorf(box / rcs); if (nc < 3) nc = 3;
    float cw = box / nc;
    std::vector<std::vector<int>> cells(nc * nc * nc);
    std::vector<std::vector<int>> nbr(n);       // Verlet half-lists (i < j)
    std::vector<V3> ref_pos(n);

    auto build = [&]() {
        for (auto &c : cells) c.clear();
        for (int i = 0; i < n; i++) {
            int cx = (int)(pos[i].x / cw) % nc, cy = (int)(pos[i].y / cw) % nc,
                cz = (int)(pos[i].z / cw) % nc;
            cells[(cx * nc + cy) * nc + cz].push_back(i);
        }
        for (int i = 0; i < n; i++) nbr[i].clear();
        for (int cx = 0; cx < nc; cx++)
        for (int cy = 0; cy < nc; cy++)
        for (int cz = 0; cz < nc; cz++) {
            auto &a = cells[(cx * nc + cy) * nc + cz];
            for (int dx = -1; dx <= 1; dx++)
            for (int dy = -1; dy <= 1; dy++)
            for (int dz = -1; dz <= 1; dz++) {
                int ox = (cx + dx + nc) % nc, oy = (cy + dy + nc) % nc,
                    oz = (cz + dz + nc) % nc;
                auto &b = cells[(ox * nc + oy) * nc + oz];
                for (int i : a) for (int j : b) {
                    if (j <= i) continue;
                    // exclusion filter: nrexcl=2 on a trimer excludes every
                    // intra-molecular pair (1-2, 2-3, 1-3) — the reference
                    // filters these at VerletList build via the exclusion
                    // list (ref src/start_simulation.py:174-197)
                    if (j / 3 == i / 3) continue;
                    float ddx = pos[i].x - pos[j].x; ddx -= box * roundf(ddx / box);
                    float ddy = pos[i].y - pos[j].y; ddy -= box * roundf(ddy / box);
                    float ddz = pos[i].z - pos[j].z; ddz -= box * roundf(ddz / box);
                    if (ddx * ddx + ddy * ddy + ddz * ddz < rcs2)
                        nbr[i].push_back(j);
                }
            }
        }
        ref_pos = pos;
    };
    build();

    auto t0 = std::chrono::steady_clock::now();
    const float sig2 = sig * sig;
    const float amp = sqrtf(2.f * kT * gamma_ / dt);
    for (int s = 0; s < steps; s++) {
        // half-kick + drift (unit mass)
        for (int i = 0; i < n; i++) {
            vel[i].x += 0.5f * dt * frc[i].x; vel[i].y += 0.5f * dt * frc[i].y;
            vel[i].z += 0.5f * dt * frc[i].z;
            pos[i].x = wrap(pos[i].x + dt * vel[i].x);
            pos[i].y = wrap(pos[i].y + dt * vel[i].y);
            pos[i].z = wrap(pos[i].z + dt * vel[i].z);
        }
        // skin trigger
        float dmax2 = 0.f;
        for (int i = 0; i < n; i++) {
            float ddx = pos[i].x - ref_pos[i].x; ddx -= box * roundf(ddx / box);
            float ddy = pos[i].y - ref_pos[i].y; ddy -= box * roundf(ddy / box);
            float ddz = pos[i].z - ref_pos[i].z; ddz -= box * roundf(ddz / box);
            float d2 = ddx * ddx + ddy * ddy + ddz * ddz;
            if (d2 > dmax2) dmax2 = d2;
        }
        if (dmax2 > 0.25f * skin * skin) build();
        // pair forces: analytic LJ (soft-core clamped like the TPU kernel)
        // or per-type-pair table interpolation
        for (int i = 0; i < n; i++) frc[i] = {0.f, 0.f, 0.f};
        for (int i = 0; i < n; i++) {
            int ti = i % 3;
            for (int j : nbr[i]) {
                float ddx = pos[i].x - pos[j].x; ddx -= box * roundf(ddx / box);
                float ddy = pos[i].y - pos[j].y; ddy -= box * roundf(ddy / box);
                float ddz = pos[i].z - pos[j].z; ddz -= box * roundf(ddz / box);
                float r2 = ddx * ddx + ddy * ddy + ddz * ddz;
                if (r2 >= rc2) continue;
                float f;
                if (tab) {
                    const std::vector<float> &F = tabF[ti * 3 + j % 3];
                    float r = sqrtf(r2);
                    float x = (r - tr0) / tdr;
                    int k = (int)x; if (k < 0) k = 0;
                    if (k >= tlen - 1) k = tlen - 2;
                    float w = x - k;
                    f = (F[k] * (1.f - w) + F[k + 1] * w) / r;
                } else {
                    float r2c = r2 > 0.5625f * sig2 ? r2 : 0.5625f * sig2;
                    float s2 = sig2 / r2c, s6 = s2 * s2 * s2;
                    f = 48.f * eps * (s6 * s6 - 0.5f * s6) / r2c;
                }
                frc[i].x += f * ddx; frc[i].y += f * ddy; frc[i].z += f * ddz;
                frc[j].x -= f * ddx; frc[j].y -= f * ddy; frc[j].z -= f * ddz;
            }
        }
        for (int m = 0; m < n / 3; m++) {
            // harmonic bonds (K/2 convention: U = (k/2)(r-r0)^2 per the
            // reference's func-1 mapping, ref gromacs_topology.py:918)
            for (int k = 0; k < 2; k++) {
                int i = 3 * m + k, j = i + 1;
                float ddx = pos[i].x - pos[j].x; ddx -= box * roundf(ddx / box);
                float ddy = pos[i].y - pos[j].y; ddy -= box * roundf(ddy / box);
                float ddz = pos[i].z - pos[j].z; ddz -= box * roundf(ddz / box);
                float r = sqrtf(ddx * ddx + ddy * ddy + ddz * ddz) + 1e-12f;
                float f = -2.f * kbond * (r - r0) / r;
                frc[i].x += f * ddx; frc[i].y += f * ddy; frc[i].z += f * ddz;
                frc[j].x -= f * ddx; frc[j].y -= f * ddy; frc[j].z -= f * ddz;
            }
            // harmonic angle MA-ML-MA (theta0 = pi): standard angular
            // force distribution over the i-j-k triple
            {
                int i = 3 * m, j = 3 * m + 1, k2 = 3 * m + 2;
                float ax = pos[i].x - pos[j].x; ax -= box * roundf(ax / box);
                float ay = pos[i].y - pos[j].y; ay -= box * roundf(ay / box);
                float az = pos[i].z - pos[j].z; az -= box * roundf(az / box);
                float bx = pos[k2].x - pos[j].x; bx -= box * roundf(bx / box);
                float by = pos[k2].y - pos[j].y; by -= box * roundf(by / box);
                float bz = pos[k2].z - pos[j].z; bz -= box * roundf(bz / box);
                float la = sqrtf(ax * ax + ay * ay + az * az) + 1e-12f;
                float lb = sqrtf(bx * bx + by * by + bz * bz) + 1e-12f;
                float cth = (ax * bx + ay * by + az * bz) / (la * lb);
                if (cth > 0.99999f) cth = 0.99999f;
                if (cth < -0.99999f) cth = -0.99999f;
                float th = acosf(cth);
                float sth = sqrtf(1.f - cth * cth) + 1e-12f;
                float dU = kang * (th - th0);       // U = (k/2)(th-th0)^2
                float c = dU / sth;
                float fia = c / la, fkb = c / lb;
                float fix = fia * (bx / lb - cth * ax / la);
                float fiy = fia * (by / lb - cth * ay / la);
                float fiz = fia * (bz / lb - cth * az / la);
                float fkx = fkb * (ax / la - cth * bx / lb);
                float fky = fkb * (ay / la - cth * by / lb);
                float fkz = fkb * (az / la - cth * bz / lb);
                frc[i].x += fix; frc[i].y += fiy; frc[i].z += fiz;
                frc[k2].x += fkx; frc[k2].y += fky; frc[k2].z += fkz;
                frc[j].x -= fix + fkx; frc[j].y -= fiy + fky;
                frc[j].z -= fiz + fkz;
            }
        }
        // Langevin + second half-kick
        for (int i = 0; i < n; i++) {
            frc[i].x += -gamma_ * vel[i].x + amp * G(rng);
            frc[i].y += -gamma_ * vel[i].y + amp * G(rng);
            frc[i].z += -gamma_ * vel[i].z + amp * G(rng);
            vel[i].x += 0.5f * dt * frc[i].x; vel[i].y += 0.5f * dt * frc[i].y;
            vel[i].z += 0.5f * dt * frc[i].z;
        }
    }
    double secs = std::chrono::duration<double>(
        std::chrono::steady_clock::now() - t0).count();
    printf("pps %.1f\n", (double)n * steps / secs);
    return 0;
}
