// wndsp — native host DSP for the TPU WaveNet vocoder framework.
//
// The reference reaches its host DSP through native dependencies (SPTK's
// C mcep/MLSA, WORLD's C++ analysis).  This library provides the
// equivalent native layer for this framework: cepstrum transforms, the
// minimum-phase MLSA noise-shaping filter, and mu-law companding, all
// exposed as a C ABI consumed from Python via ctypes
// (pytorchwavenetvocoder_tpu/native.py).  Every routine matches the
// in-repo numpy implementation (dsp/cepstrum.py, dsp/mlsa.py,
// ops/mulaw.py) to float tolerance; the numpy versions remain the
// reference implementations and fallback.
//
// Build: make -C native   (produces libwndsp.so)

#include <cmath>
#include <complex>
#include <cstdint>
#include <cstring>
#include <limits>
#include <vector>

namespace {

using cplx = std::complex<double>;

// ---------------------------------------------------------------------
// iterative radix-2 complex FFT (in-place), n must be a power of two
// ---------------------------------------------------------------------
void fft_inplace(std::vector<cplx>& a, bool invert) {
  const size_t n = a.size();
  for (size_t i = 1, j = 0; i < n; i++) {
    size_t bit = n >> 1;
    for (; j & bit; bit >>= 1) j ^= bit;
    j ^= bit;
    if (i < j) std::swap(a[i], a[j]);
  }
  for (size_t len = 2; len <= n; len <<= 1) {
    const double ang = 2.0 * M_PI / (double)len * (invert ? 1.0 : -1.0);
    const cplx wlen(std::cos(ang), std::sin(ang));
    for (size_t i = 0; i < n; i += len) {
      cplx w(1.0);
      for (size_t j = 0; j < len / 2; j++) {
        cplx u = a[i + j];
        cplx v = a[i + j + len / 2] * w;
        a[i + j] = u + v;
        a[i + j + len / 2] = u - v;
        w *= wlen;
      }
    }
  }
  if (invert) {
    for (auto& x : a) x /= (double)n;
  }
}

}  // namespace

extern "C" {

// ---------------------------------------------------------------------
// freqt: all-pass frequency warping of a cepstrum (Oppenheim recursion)
// c (m1,) -> g (order+1,)
// ---------------------------------------------------------------------
void wndsp_freqt(const double* c, int m1, int order, double alpha, double* g) {
  std::vector<double> cur(order + 1, 0.0), prev(order + 1, 0.0);
  const double beta = 1.0 - alpha * alpha;
  for (int i = m1 - 1; i >= 0; --i) {
    prev = cur;
    cur[0] = c[i] + alpha * prev[0];
    if (order >= 1) cur[1] = beta * prev[0] + alpha * prev[1];
    for (int m = 2; m <= order; ++m)
      cur[m] = prev[m - 1] + alpha * (prev[m] - cur[m - 1]);
  }
  std::memcpy(g, cur.data(), sizeof(double) * (order + 1));
}

// mc2b / b2mc ----------------------------------------------------------
void wndsp_mc2b(const double* mc, int m1, double alpha, double* b) {
  b[m1 - 1] = mc[m1 - 1];
  for (int m = m1 - 2; m >= 0; --m) b[m] = mc[m] - alpha * b[m + 1];
}

void wndsp_b2mc(const double* b, int m1, double alpha, double* mc) {
  mc[m1 - 1] = b[m1 - 1];
  for (int m = m1 - 2; m >= 0; --m) mc[m] = b[m] + alpha * b[m + 1];
}

// ---------------------------------------------------------------------
// sp2mc: one-sided power spectrum (n_fft/2+1) -> mel-cepstrum (order+1)
// ---------------------------------------------------------------------
void wndsp_sp2mc(const double* power_spec, int n_half1, int order,
                 double alpha, double eps, double* mc) {
  const int n_fft = (n_half1 - 1) * 2;
  std::vector<cplx> buf(n_fft);
  for (int i = 0; i < n_half1; ++i) {
    double p = power_spec[i] > eps ? power_spec[i] : eps;
    buf[i] = cplx(0.5 * std::log(p), 0.0);
  }
  for (int i = n_half1; i < n_fft; ++i) buf[i] = buf[n_fft - i];
  fft_inplace(buf, true);  // inverse fft of the symmetric log spectrum
  std::vector<double> cep(n_half1);
  cep[0] = buf[0].real();
  for (int i = 1; i < n_half1 - 1; ++i) cep[i] = 2.0 * buf[i].real();
  cep[n_half1 - 1] = buf[n_half1 - 1].real();
  wndsp_freqt(cep.data(), n_half1, order, alpha, mc);
}

// ---------------------------------------------------------------------
// UELS Newton refinement (SPTK mcep's iteration; matches
// dsp/cepstrum.py uels_refine).  power_spec is the one-sided floored
// periodogram; c (order+1) is updated in place.
// ---------------------------------------------------------------------
void wndsp_uels_refine(double* c, int order, const double* power_spec,
                       int n_half1, double alpha, int n_iter,
                       double threshold) {
  const int n_fft = (n_half1 - 1) * 2;
  // log spectrum resampled onto the warped axis: full freqt of the
  // cepstrum of log(power)/2, then cosine reconstruction
  std::vector<cplx> buf(n_fft);
  for (int i = 0; i < n_half1; ++i)
    buf[i] = cplx(0.5 * std::log(power_spec[i]), 0.0);
  for (int i = n_half1; i < n_fft; ++i) buf[i] = buf[n_fft - i];
  fft_inplace(buf, true);
  std::vector<double> cep(n_half1);
  cep[0] = buf[0].real();
  for (int i = 1; i < n_half1 - 1; ++i) cep[i] = 2.0 * buf[i].real();
  cep[n_half1 - 1] = buf[n_half1 - 1].real();
  std::vector<double> cw(n_half1);
  wndsp_freqt(cep.data(), n_half1, n_fft / 2, alpha, cw.data());
  for (auto& b : buf) b = cplx(0.0, 0.0);
  buf[0] = cplx(cw[0], 0.0);
  for (int i = 1; i < n_half1 - 1; ++i) {
    buf[i] = cplx(0.5 * cw[i], 0.0);
    buf[n_fft - i] = buf[i];
  }
  buf[n_half1 - 1] = cplx(cw[n_half1 - 1], 0.0);
  fft_inplace(buf, false);
  std::vector<double> log_sw(n_fft);
  for (int i = 0; i < n_fft; ++i) log_sw[i] = 2.0 * buf[i].real();

  const int m2 = 2 * order + 1;
  std::vector<double> r(m2), grad(order), H((size_t)order * order);
  for (int it = 0; it < n_iter; ++it) {
    // log|H| = c0 + sum c_m cos(m lam) (halved-interior mirrored FFT)
    for (auto& b : buf) b = cplx(0.0, 0.0);
    buf[0] = cplx(c[0], 0.0);
    for (int m = 1; m <= order; ++m) {
      buf[m] = cplx(0.5 * c[m], 0.0);
      buf[n_fft - m] = buf[m];
    }
    fft_inplace(buf, false);
    for (int i = 0; i < n_fft; ++i)
      buf[i] = cplx(std::exp(log_sw[i] - 2.0 * buf[i].real()), 0.0);
    fft_inplace(buf, true);  // Fourier coefficients of the residual E
    for (int m = 0; m < m2; ++m) r[m] = buf[m].real();
    // analytic gain step keeps the undamped Newton stable
    c[0] += 0.5 * std::log(r[0]);
    for (int m = m2 - 1; m >= 0; --m) r[m] /= r[0];
    double gmax = 0.0;
    for (int m = 1; m <= order; ++m) {
      grad[m - 1] = r[m];
      gmax = std::max(gmax, std::fabs(r[m]));
    }
    if (gmax < threshold) break;
    // (Toeplitz + Hankel) delta = grad, m,n in 1..order
    for (int m = 1; m <= order; ++m)
      for (int n2 = 1; n2 <= order; ++n2)
        H[(size_t)(m - 1) * order + (n2 - 1)] =
            r[std::abs(m - n2)] + r[m + n2];
    // Gaussian elimination with partial pivoting
    std::vector<double> A(H);
    std::vector<double> b2(grad);
    bool singular = false;
    for (int col = 0; col < order && !singular; ++col) {
      int piv = col;
      for (int row = col + 1; row < order; ++row)
        if (std::fabs(A[(size_t)row * order + col]) >
            std::fabs(A[(size_t)piv * order + col]))
          piv = row;
      if (std::fabs(A[(size_t)piv * order + col]) < 1e-300) {
        singular = true;
        break;
      }
      if (piv != col) {
        for (int j = 0; j < order; ++j)
          std::swap(A[(size_t)col * order + j], A[(size_t)piv * order + j]);
        std::swap(b2[col], b2[piv]);
      }
      for (int row = col + 1; row < order; ++row) {
        const double f = A[(size_t)row * order + col] / A[(size_t)col * order + col];
        for (int j = col; j < order; ++j)
          A[(size_t)row * order + j] -= f * A[(size_t)col * order + j];
        b2[row] -= f * b2[col];
      }
    }
    if (singular) break;
    for (int row = order - 1; row >= 0; --row) {
      double s = b2[row];
      for (int j = row + 1; j < order; ++j)
        s -= A[(size_t)row * order + j] * b2[j];
      b2[row] = s / A[(size_t)row * order + row];
    }
    for (int m = 1; m <= order; ++m) c[m] += b2[m - 1];
  }
}

// batched sp2mc over frames: (n_frames, n_half1) -> (n_frames, order+1)
void wndsp_sp2mc_batch(const double* power_spec, int n_frames, int n_half1,
                       int order, double alpha, double eps, double* out) {
  for (int t = 0; t < n_frames; ++t)
    wndsp_sp2mc(power_spec + (size_t)t * n_half1, n_half1, order, alpha,
                eps, out + (size_t)t * (order + 1));
}

// mcep of a windowed frame (periodogram + sp2mc [+ UELS Newton]) -------
void wndsp_mcep_frame(const double* frame, int n, int n_fft, int order,
                      double alpha, double eps, int refine, double* mc) {
  std::vector<cplx> buf(n_fft, cplx(0.0, 0.0));
  for (int i = 0; i < n && i < n_fft; ++i) buf[i] = cplx(frame[i], 0.0);
  fft_inplace(buf, false);
  const int n_half1 = n_fft / 2 + 1;
  std::vector<double> ps(n_half1);
  for (int i = 0; i < n_half1; ++i)
    ps[i] = std::max(std::norm(buf[i]), eps);
  wndsp_sp2mc(ps.data(), n_half1, order, alpha, eps, mc);
  if (refine)
    wndsp_uels_refine(mc, order, ps.data(), n_half1, alpha, 30, 1e-8);
}

// framewise stft mcep over a signal (hop/window provided) --------------
void wndsp_stft_mcep(const double* x, int n, const double* window, int fftl,
                     int shiftl, int order, double alpha, double eps,
                     int refine, double* out /* (n_frames, order+1) */) {
  const int n_frames = (n - fftl) / shiftl + 1;
  std::vector<double> frame(fftl);
  for (int t = 0; t < n_frames; ++t) {
    const double* seg = x + (size_t)t * shiftl;
    for (int i = 0; i < fftl; ++i) frame[i] = seg[i] * window[i];
    wndsp_mcep_frame(frame.data(), fftl, fftl, order, alpha, eps, refine,
                     out + (size_t)t * (order + 1));
  }
}

// ---------------------------------------------------------------------
// MLSA impulse response: exp(sum b_m Phi_m(z)) as a causal minimum-phase
// IR (matches dsp/mlsa.py mlsa_impulse_response)
// ---------------------------------------------------------------------
void wndsp_mlsa_ir(const double* coef, int m1, double alpha, int n_fft,
                   int ir_length, double* h) {
  std::vector<double> mc(m1);
  wndsp_b2mc(coef, m1, alpha, mc.data());
  std::vector<double> c(n_fft / 2 + 1);
  wndsp_freqt(mc.data(), m1, n_fft / 2, -alpha, c.data());
  std::vector<cplx> buf(n_fft, cplx(0.0, 0.0));
  for (int i = 0; i <= n_fft / 2; ++i) buf[i] = cplx(c[i], 0.0);
  fft_inplace(buf, false);               // C(w) on the unit circle
  for (auto& v : buf) v = std::exp(v);   // H = exp(C)
  fft_inplace(buf, true);                // back to time domain
  for (int i = 0; i < ir_length; ++i) h[i] = buf[i].real();
}

// causal FIR filtering y[t] = sum_k h[k] x[t-k] via overlap-free direct
// convolution in the frequency domain (block FFT convolution)
void wndsp_fir_filter(const double* x, int n, const double* h, int ir_len,
                      double* y) {
  // choose fft size >= 2 * max(block, ir)
  int blk = 1;
  while (blk < 4 * ir_len) blk <<= 1;
  const int step = blk - ir_len + 1;
  std::vector<cplx> H(blk, cplx(0, 0));
  for (int i = 0; i < ir_len; ++i) H[i] = cplx(h[i], 0.0);
  fft_inplace(H, false);
  std::vector<double> acc(n + blk, 0.0);
  std::vector<cplx> buf(blk);
  for (int start = 0; start < n; start += step) {
    const int m = std::min(step, n - start);
    for (int i = 0; i < m; ++i) buf[i] = cplx(x[start + i], 0.0);
    for (int i = m; i < blk; ++i) buf[i] = cplx(0.0, 0.0);
    fft_inplace(buf, false);
    for (int i = 0; i < blk; ++i) buf[i] *= H[i];
    fft_inplace(buf, true);
    for (int i = 0; i < blk && start + i < (int)acc.size(); ++i)
      acc[start + i] += buf[i].real();
  }
  std::memcpy(y, acc.data(), sizeof(double) * n);
}

// time-invariant MLSA filtering (the noise-shaping hot path)
void wndsp_mlsa_filter(const double* x, int n, const double* coef, int m1,
                       double alpha, int n_fft, int ir_len, double* y) {
  std::vector<double> h(ir_len);
  wndsp_mlsa_ir(coef, m1, alpha, n_fft, ir_len, h.data());
  wndsp_fir_filter(x, n, h.data(), ir_len, y);
}

// ---------------------------------------------------------------------
// mu-law companding (matches ops/mulaw.py)
// ---------------------------------------------------------------------
void wndsp_encode_mu_law(const double* x, int n, int mu, int32_t* y) {
  const double m = (double)(mu - 1);
  const double denom = std::log1p(m);
  for (int i = 0; i < n; ++i) {
    double s = x[i] > 0 ? 1.0 : (x[i] < 0 ? -1.0 : 0.0);
    double fx = s * std::log1p(m * std::fabs(x[i])) / denom;
    y[i] = (int32_t)std::floor((fx + 1.0) / 2.0 * m + 0.5);
  }
}

void wndsp_decode_mu_law(const int32_t* y, int n, int mu, double* x) {
  const double m = (double)(mu - 1);
  for (int i = 0; i < n; ++i) {
    double fx = ((double)y[i] - 0.5) / m * 2.0 - 1.0;
    double s = fx > 0 ? 1.0 : (fx < 0 ? -1.0 : 0.0);
    x[i] = s / m * (std::pow(1.0 + m, std::fabs(fx)) - 1.0);
  }
}

// ---------------------------------------------------------------------
// band-constrained DTW over Euclidean frame distance (the MCD parity
// harness's alignment; mirrors eval/mcd.py::_dtw_path cell-for-cell:
// same Sakoe-Chiba band around the i*Tb/Ta diagonal and the same
// tie-breaking order up(<) / diag(<=) / left(<), and the same strict
// left-to-right per-cell distance accumulation over dims — the numpy
// spec sums column-by-column for exactly this reason — so the two
// paths are identical and the numpy version remains the executable
// spec)
// ---------------------------------------------------------------------
// a: (Ta, dim) row-major, b: (Tb, dim).  path_i/path_j/path_cost must
// hold Ta+Tb entries.  Returns the path length, or -1 when the band is
// too narrow to connect the corners.
int wndsp_dtw_band(const double* a, int Ta, const double* b, int Tb,
                   int dim, int band, int32_t* path_i, int32_t* path_j,
                   double* path_cost) {
  if (Ta <= 0 || Tb <= 0) return -1;
  int bw = band;
  const int min_bw = (Ta > Tb ? Ta - Tb : Tb - Ta) + 1;
  if (bw < min_bw) bw = min_bw;
  const double INF = std::numeric_limits<double>::infinity();
  std::vector<double> acc((size_t)Ta * Tb, INF);
  std::vector<double> dist((size_t)Ta * Tb, INF);
  std::vector<int8_t> back((size_t)Ta * Tb, 0);  // 0=diag 1=up 2=left
  for (int i = 0; i < Ta; ++i) {
    const long diag = (long)i * Tb / Ta;
    int lo = (int)(diag - bw); if (lo < 0) lo = 0;
    int hi = (int)(diag + bw + 1); if (hi > Tb) hi = Tb;
    const double* ai = a + (size_t)i * dim;
    for (int j = lo; j < hi; ++j) {
      const double* bj = b + (size_t)j * dim;
      double d = 0.0;
      for (int c = 0; c < dim; ++c) {
        const double e = bj[c] - ai[c];
        d += e * e;
      }
      dist[(size_t)i * Tb + j] = std::sqrt(d);
    }
    if (i == 0) {
      double run = 0.0;
      for (int j = lo; j < hi; ++j) {
        run += dist[j];
        acc[j] = run;
        back[j] = 2;
      }
      back[0] = -1;
      continue;
    }
    const size_t row = (size_t)i * Tb, prev = row - Tb;
    for (int j = lo; j < hi; ++j) {
      double best = INF;
      int8_t step = 0;
      if (acc[prev + j] < best) { best = acc[prev + j]; step = 1; }
      if (j > 0) {
        if (acc[prev + j - 1] <= best) { best = acc[prev + j - 1]; step = 0; }
        if (acc[row + j - 1] < best) { best = acc[row + j - 1]; step = 2; }
      }
      if (best < INF) {
        acc[row + j] = best + dist[row + j];
        back[row + j] = step;
      }
    }
  }
  if (!std::isfinite(acc[(size_t)Ta * Tb - 1])) return -1;
  // trace back, then reverse in place
  int n = 0, i = Ta - 1, j = Tb - 1;
  for (;;) {
    path_i[n] = i;
    path_j[n] = j;
    path_cost[n] = dist[(size_t)i * Tb + j];
    ++n;
    if (i == 0 && j == 0) break;
    const int8_t s = back[(size_t)i * Tb + j];
    if (s == 0) { --i; --j; }
    else if (s == 1) { --i; }
    else { --j; }
  }
  for (int lo2 = 0, hi2 = n - 1; lo2 < hi2; ++lo2, --hi2) {
    std::swap(path_i[lo2], path_i[hi2]);
    std::swap(path_j[lo2], path_j[hi2]);
    std::swap(path_cost[lo2], path_cost[hi2]);
  }
  return n;
}

int wndsp_version(void) { return 3; }

}  // extern "C"
