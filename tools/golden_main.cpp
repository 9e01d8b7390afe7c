// Golden-state generator: drives the UNMODIFIED reference engine
// (/root/reference/src/sph.cpp, compiled against the Qt stubs in qtstub/)
// and dumps the full particle state after each step as raw binary.
//
// Usage: golden_gen <steps> <out_dir> [dump_every]
//
// Dump format per file state_NNNN.bin (little-endian):
//   int32 N
//   float mass[N], density[N], position[3N], velocity[3N],
//   float acceleration[3N]
//   int32 neighborCount[N]
//   int32 neighborIds[N*32]          (the per-particle neighbor tables)
//   float neighborDists[N*32]
//
// Timing for the CPU baseline row is printed to stdout.

#include <chrono>
#include <cstdio>
#include <cstdlib>
#include <string>

#include "particle.h"
#include "sph.h"

// The reference declares these Qt signals; without moc we define them inert.
void SPH::updateElapsed(int, int, int, int, int, int) {}
void SPH::stepFinished() {}

// Accessor subclass: the neighbor tables are protected members.
class GoldenSPH : public SPH {
 public:
  using SPH::step;
  const uint32_t* neighbors() const { return mNeighbors; }
  const float* neighborDists() const { return mNeighborDistancesScaled; }
  int examineCount() const { return mExamineCount; }
};

static void dump_state(GoldenSPH& sph, const std::string& dir, int step) {
  char path[512];
  snprintf(path, sizeof(path), "%s/state_%05d.bin", dir.c_str(), step);
  FILE* f = fopen(path, "wb");
  if (!f) {
    perror("fopen");
    exit(1);
  }
  Particle* p = sph.getParticles();
  int n = sph.getParticleCount();
  fwrite(&n, sizeof(int), 1, f);
  fwrite(p->mMass.data(), sizeof(float), n, f);
  fwrite(p->mDensity.data(), sizeof(float), n, f);
  fwrite(p->mPosition.data(), sizeof(float), 3 * n, f);
  fwrite(p->mVelocity.data(), sizeof(float), 3 * n, f);
  fwrite(p->mAcceleration.data(), sizeof(float), 3 * n, f);
  fwrite(p->mNeighborCount.data(), sizeof(int), n, f);
  fwrite(sph.neighbors(), sizeof(uint32_t), (size_t)n * sph.examineCount(), f);
  fwrite(sph.neighborDists(), sizeof(float), (size_t)n * sph.examineCount(), f);
  fclose(f);
}

int main(int argc, char** argv) {
  int steps = argc > 1 ? atoi(argv[1]) : 10;
  std::string dir = argc > 2 ? argv[2] : "golden";
  int every = argc > 3 ? atoi(argv[3]) : 1;

  std::string mk = "mkdir -p " + dir + " out";
  if (system(mk.c_str()) != 0) return 1;

  GoldenSPH sph;
  printf("particles=%d steps=%d dump_every=%d\n", sph.getParticleCount(),
         steps, every);
  dump_state(sph, dir, 0);

  auto t0 = std::chrono::steady_clock::now();
  for (int s = 1; s <= steps; ++s) {
    sph.step();
    if (s % every == 0 || s == steps) dump_state(sph, dir, s);
  }
  auto dt = std::chrono::duration<double>(std::chrono::steady_clock::now() - t0)
                .count();
  printf("cpu_reference: %d steps in %.3f s  (%.2f ms/step, %.3e particle-steps/s)\n",
         steps, dt, dt * 1000.0 / steps,
         (double)sph.getParticleCount() * steps / dt);
  return 0;
}
