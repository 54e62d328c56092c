// Native float64 oracle renderer (C++/OpenMP).
//
// Role: the numpy oracle (oracle/reference_np.py) is the fidelity anchor for
// the JAX/Pallas pipeline, but pure numpy is slow at 1024^2 x 64 objects —
// too slow to use as a routine check at driver-config-5 scale. This is the
// same float64 math (identical eps conventions, near-root-only sphere
// intersection, hard shadows, checker select) as a native library,
// parallelized over image rows with OpenMP. Bound via ctypes
// (oracle/native.py); tests assert it matches the numpy oracle to 1e-12.
//
// The reference itself (lebek/reversible-raytracer) shipped no native code —
// Theano's codegen was its native layer (SURVEY.md §2 native-code
// checklist) — so this file is new-framework runtime, not a port.

#include <cmath>
#include <cstdint>

namespace {

constexpr double BIG = 1e10;
constexpr double T_EPS = 1e-3;
constexpr double SHADOW_EPS = 1e-3;

struct Vec3 {
  double x, y, z;
};

inline Vec3 operator+(Vec3 a, Vec3 b) { return {a.x + b.x, a.y + b.y, a.z + b.z}; }
inline Vec3 operator-(Vec3 a, Vec3 b) { return {a.x - b.x, a.y - b.y, a.z - b.z}; }
inline Vec3 operator*(Vec3 a, double s) { return {a.x * s, a.y * s, a.z * s}; }
inline double dot(Vec3 a, Vec3 b) { return a.x * b.x + a.y * b.y + a.z * b.z; }
inline Vec3 cross(Vec3 a, Vec3 b) {
  return {a.y * b.z - a.z * b.y, a.z * b.x - a.x * b.z, a.x * b.y - a.y * b.x};
}
inline Vec3 normalize(Vec3 a) {
  double n = std::sqrt(dot(a, a));
  return n > 1e-12 ? a * (1.0 / n) : a;
}
inline Vec3 load3(const double* p) { return {p[0], p[1], p[2]}; }

// Per-object material layout (13 doubles, ABI v3):
// color[3], color2[3], checker, checker_scale, ka, kd, ks, shininess, mirror
constexpr int MAT_STRIDE = 13;
struct Mat {
  Vec3 color, color2;
  double checker, scale, ka, kd, ks, shin, mirror;
};
inline Mat load_mat(const double* p) {
  return {load3(p), load3(p + 3), p[6], p[7], p[8], p[9], p[10], p[11], p[12]};
}

struct SceneView {
  const double *sc, *sr, *smat;
  int n_sph;
  const double* stex;  // (n_sph, sph_tex_k, sph_tex_k, 3) or nullptr
  int sph_tex_k;       // 0 = untextured spheres
  const double *ro, *ru, *rv, *rmat;
  int n_rct;
  const double* rtex;  // (n_rct, tex_k, tex_k, 3) texel grid, or nullptr
  int tex_k;           // 0 = untextured
  const double *lp, *lc;
  int n_lights;
  Vec3 ambient, background;
  const double* env;   // (env_k, env_k, 3) lat-long environment map
  int env_k;           // 0 = flat background
  bool shadows;
  double checker_tau;  // 0 = hard reference checker; > 0 = soft blend
  int reflections;     // mirror bounces (RenderConfig.reflections)
};

inline double sphere_t(Vec3 o, Vec3 d, Vec3 c, double r) {
  Vec3 oc = o - c;
  double b = dot(oc, d);
  double cc = dot(oc, oc) - r * r;
  double disc = b * b - cc;
  if (disc <= 0.0) return BIG;
  double t = -b - std::sqrt(disc);
  return t > T_EPS ? t : BIG;
}

inline double rect_t(Vec3 o, Vec3 d, Vec3 p0, Vec3 eu, Vec3 ev, double* a_out,
                     double* b_out, Vec3* n_out) {
  Vec3 n = cross(eu, ev);
  double denom = dot(d, n);
  if (std::abs(denom) <= 1e-9) return BIG;
  double t = dot(p0 - o, n) / denom;
  if (t <= T_EPS) return BIG;
  Vec3 rel = (o + d * t) - p0;
  double a = dot(rel, eu) / dot(eu, eu);
  double b = dot(rel, ev) / dot(ev, ev);
  if (a < 0.0 || a > 1.0 || b < 0.0 || b > 1.0) return BIG;
  if (a_out) *a_out = a;
  if (b_out) *b_out = b;
  if (n_out) *n_out = n;
  return t;
}

inline bool occluded(const SceneView& s, Vec3 o, Vec3 dir, double dist) {
  for (int k = 0; k < s.n_sph; ++k)
    if (sphere_t(o, dir, load3(s.sc + 3 * k), s.sr[k]) < dist) return true;
  for (int k = 0; k < s.n_rct; ++k)
    if (rect_t(o, dir, load3(s.ro + 3 * k), load3(s.ru + 3 * k),
               load3(s.rv + 3 * k), nullptr, nullptr, nullptr) < dist)
      return true;
  return false;
}

inline Vec3 checker_color(const Mat& m, double parity) {
  bool use2 = (m.checker * parity) > 0.5;
  return use2 ? m.color2 : m.color;
}

// Soft checker (RenderConfig.checker_tau): f64 mirror of
// pipeline.soft_checker_q, including the 1e-6 denominator guard.
inline double soft_q1(double x, double tau) {
  double mm = std::fmod(x - 0.5, 2.0);
  if (mm < 0) mm += 2.0;
  double tri = 2.0 * std::abs(mm - 1.0) - 1.0;
  return tri / (std::abs(tri) + tau + 1e-6);
}

// f64 mirror of pipeline.sample_texture / reference_np._sample_texture:
// bilinear with clamp-at-edge (wrap_a wraps the first axis — the lat-long
// azimuth seam), identical clamp/floor/mod sequence.
inline Vec3 sample_texture(const double* tex, int k, double a, double b,
                           bool wrap_a = false) {
  double u = a * k - 0.5, v = b * k - 0.5;
  int i0, i1;
  double fi;
  if (wrap_a) {
    double i0f = std::floor(u);
    fi = u - i0f;
    i0 = int(i0f) % k;
    if (i0 < 0) i0 += k;
    i1 = (i0 + 1) % k;
  } else {
    double i0f = std::floor(u);
    if (i0f < 0.0) i0f = 0.0;
    if (i0f > k - 1) i0f = k - 1;
    fi = u - i0f;
    if (fi < 0.0) fi = 0.0;
    if (fi > 1.0) fi = 1.0;
    i0 = int(i0f);
    i1 = i0 + 1 < k ? i0 + 1 : k - 1;
  }
  double j0f = std::floor(v);
  if (j0f < 0.0) j0f = 0.0;
  if (j0f > k - 1) j0f = k - 1;
  double fj = v - j0f;
  if (fj < 0.0) fj = 0.0;
  if (fj > 1.0) fj = 1.0;
  int j0 = int(j0f);
  int j1 = j0 + 1 < k ? j0 + 1 : k - 1;
  const double* t00 = tex + (size_t(i0) * k + j0) * 3;
  const double* t01 = tex + (size_t(i0) * k + j1) * 3;
  const double* t10 = tex + (size_t(i1) * k + j0) * 3;
  const double* t11 = tex + (size_t(i1) * k + j1) * 3;
  Vec3 out;
  out.x = (1.0 - fi) * ((1.0 - fj) * t00[0] + fj * t01[0]) + fi * ((1.0 - fj) * t10[0] + fj * t11[0]);
  out.y = (1.0 - fi) * ((1.0 - fj) * t00[1] + fj * t01[1]) + fi * ((1.0 - fj) * t10[1] + fj * t11[1]);
  out.z = (1.0 - fi) * ((1.0 - fj) * t00[2] + fj * t01[2]) + fi * ((1.0 - fj) * t10[2] + fj * t11[2]);
  return out;
}

inline Vec3 checker_color_soft(const Mat& m, double q) {
  double use2 = m.checker * (0.5 - 0.5 * q);
  return {m.color.x + use2 * (m.color2.x - m.color.x),
          m.color.y + use2 * (m.color2.y - m.color.y),
          m.color.z + use2 * (m.color2.z - m.color.z)};
}

// depth: remaining mirror bounces. Recursion is bitwise equivalent to the
// numpy oracle's _radiance (skipping the recursion where mirror == 0 or the
// ray missed is an exact no-op: the blend weight there is exactly 0).
inline Vec3 shade_pixel(const SceneView& s, Vec3 o, Vec3 d, int depth) {
  // Nearest hit over spheres then rects (first-wins ties, matching the
  // unrolled where-chain / numpy argmin).
  double t_best = BIG;
  int best = -1;
  double ra = 0, rb = 0;
  Vec3 rn{0, 0, 0};
  for (int k = 0; k < s.n_sph; ++k) {
    double t = sphere_t(o, d, load3(s.sc + 3 * k), s.sr[k]);
    if (t < t_best) { t_best = t; best = k; }
  }
  for (int k = 0; k < s.n_rct; ++k) {
    double a, b;
    Vec3 n;
    double t = rect_t(o, d, load3(s.ro + 3 * k), load3(s.ru + 3 * k),
                      load3(s.rv + 3 * k), &a, &b, &n);
    if (t < t_best) { t_best = t; best = s.n_sph + k; ra = a; rb = b; rn = n; }
  }
  if (best < 0) {
    if (s.env_k > 0) {
      // Lat-long env-map sample of the (unit) ray direction — f64 mirror
      // of pipeline.miss_color (sphere_uv of d, guard included).
      double uu = std::atan2(d.z, d.x) * (0.5 / M_PI) + 0.5;
      double dy = d.y;
      if (dy < -1.0 + 1e-6) dy = -1.0 + 1e-6;
      if (dy > 1.0 - 1e-6) dy = 1.0 - 1e-6;
      double vv = 0.5 - std::asin(dy) / M_PI;
      return sample_texture(s.env, s.env_k, uu, vv, /*wrap_a=*/true);
    }
    return s.background;
  }

  Vec3 p = o + d * t_best;
  Vec3 normal, base;
  Mat m{};
  if (best < s.n_sph) {
    m = load_mat(s.smat + MAT_STRIDE * best);
    Vec3 c = load3(s.sc + 3 * best);
    Vec3 pl = p - c;
    normal = pl * (1.0 / s.sr[best]);
    if (s.sph_tex_k > 0) {
      // Lat-long texture (pipeline.sphere_uv, guard included): azimuth
      // wraps, polar clamps.
      double uu = std::atan2(normal.z, normal.x) * (0.5 / M_PI) + 0.5;
      double ny = normal.y;
      if (ny < -1.0 + 1e-6) ny = -1.0 + 1e-6;
      if (ny > 1.0 - 1e-6) ny = 1.0 - 1e-6;
      double vv = 0.5 - std::asin(ny) / M_PI;
      base = sample_texture(
          s.stex + size_t(best) * s.sph_tex_k * s.sph_tex_k * 3,
          s.sph_tex_k, uu, vv, /*wrap_a=*/true);
    } else if (s.checker_tau > 0.0) {
      double q = soft_q1(pl.x * m.scale, s.checker_tau) *
                 soft_q1(pl.y * m.scale, s.checker_tau) *
                 soft_q1(pl.z * m.scale, s.checker_tau);
      base = checker_color_soft(m, q);
    } else {
      double parity = std::fmod(std::floor(pl.x * m.scale) + std::floor(pl.y * m.scale) +
                                    std::floor(pl.z * m.scale),
                                2.0);
      if (parity < 0) parity += 2.0;
      base = checker_color(m, parity);
    }
  } else {
    int k = best - s.n_sph;
    m = load_mat(s.rmat + MAT_STRIDE * k);
    Vec3 n_unit = normalize(rn);
    double facing = dot(d, n_unit) < 0.0 ? 1.0 : -1.0;
    normal = n_unit * facing;
    if (s.tex_k > 0) {
      // Image texture replaces the checker/solid base color.
      base = sample_texture(
          s.rtex + size_t(k) * s.tex_k * s.tex_k * 3, s.tex_k, ra, rb);
    } else if (s.checker_tau > 0.0) {
      double q = soft_q1(ra * m.scale, s.checker_tau) *
                 soft_q1(rb * m.scale, s.checker_tau);
      base = checker_color_soft(m, q);
    } else {
      double parity =
          std::fmod(std::floor(ra * m.scale) + std::floor(rb * m.scale), 2.0);
      if (parity < 0) parity += 2.0;
      base = checker_color(m, parity);
    }
  }

  Vec3 col = {m.ka * base.x * s.ambient.x, m.ka * base.y * s.ambient.y,
              m.ka * base.z * s.ambient.z};
  Vec3 view = d * -1.0;
  Vec3 shadow_o = p + normal * SHADOW_EPS;
  for (int li = 0; li < s.n_lights; ++li) {
    Vec3 lpos = load3(s.lp + 3 * li);
    Vec3 lcol = load3(s.lc + 3 * li);
    Vec3 lvec = lpos - shadow_o;
    double dist = std::sqrt(dot(lvec, lvec));
    Vec3 ldir = lvec * (dist > 1e-9 ? 1.0 / dist : 1.0);
    double vis = 1.0;
    if (s.shadows && occluded(s, shadow_o, ldir, dist)) vis = 0.0;
    double ndotl = dot(normal, ldir);
    if (ndotl < 0.0) ndotl = 0.0;
    Vec3 refl = normal * (2.0 * ndotl) - ldir;
    double rdotv = dot(refl, view);
    double spec = rdotv > 0.0 ? m.ks * std::pow(rdotv, m.shin) : 0.0;
    col.x += vis * (m.kd * ndotl * base.x + spec) * lcol.x;
    col.y += vis * (m.kd * ndotl * base.y + spec) * lcol.y;
    col.z += vis * (m.kd * ndotl * base.z + spec) * lcol.z;
  }
  if (depth > 0 && m.mirror != 0.0) {
    // lerp(local, reflected, mirror) — unclipped per level, matching
    // pipeline.shade's reflective path and the numpy oracle.
    Vec3 rdir = d - normal * (2.0 * dot(d, normal));
    Vec3 ro = p + normal * SHADOW_EPS;
    Vec3 rcol = shade_pixel(s, ro, rdir, depth - 1);
    col.x += m.mirror * (rcol.x - col.x);
    col.y += m.mirror * (rcol.y - col.y);
    col.z += m.mirror * (rcol.z - col.z);
  }
  return col;
}

}  // namespace

extern "C" {

// out: H*W*3 doubles, row-major.
void rrt_render(const double* sph_center, const double* sph_radius,
                const double* sph_mat, int n_sph, const double* rct_origin,
                const double* rct_eu, const double* rct_ev, const double* rct_mat,
                int n_rct, const double* light_pos, const double* light_col,
                int n_lights, const double* cam, const double* ambient,
                const double* background, int H, int W, int shadows, int clip,
                double checker_tau, int reflections, const double* rct_tex,
                int tex_k, const double* sph_tex, int sph_tex_k,
                const double* env, int env_k,
                double* out) {
  SceneView s{sph_center, sph_radius, sph_mat, n_sph,
              sph_tex,    sph_tex_k,
              rct_origin, rct_eu,     rct_ev,  rct_mat,
              n_rct,      rct_tex,    tex_k,
              light_pos,  light_col,  n_lights,
              load3(ambient), load3(background), env, env_k,
              shadows != 0, checker_tau, reflections};

  Vec3 eye = load3(cam), look = load3(cam + 3), up_hint = load3(cam + 6);
  double fov = cam[9];
  Vec3 fwd = normalize(look - eye);
  Vec3 right = normalize(cross(fwd, up_hint));
  Vec3 up = cross(right, fwd);
  double tanf = std::tan(fov * (M_PI / 180.0) * 0.5);
  double aspect = double(W) / double(H);

#pragma omp parallel for schedule(dynamic, 8)
  for (int i = 0; i < H; ++i) {
    for (int j = 0; j < W; ++j) {
      double sx = ((j + 0.5) * (2.0 / W) - 1.0) * tanf * aspect;
      double sy = (1.0 - (i + 0.5) * (2.0 / H)) * tanf;
      Vec3 d = normalize(fwd + right * sx + up * sy);
      Vec3 c = shade_pixel(s, eye, d, s.reflections);
      double* px = out + (size_t(i) * W + j) * 3;
      if (clip) {
        c.x = c.x < 0 ? 0 : (c.x > 1 ? 1 : c.x);
        c.y = c.y < 0 ? 0 : (c.y > 1 ? 1 : c.y);
        c.z = c.z < 0 ? 0 : (c.z > 1 ? 1 : c.z);
      }
      px[0] = c.x;
      px[1] = c.y;
      px[2] = c.z;
    }
  }
}

int rrt_version() { return 6; }  // v6: lat-long environment map (env, env_k)

}  // extern "C"
