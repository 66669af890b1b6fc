// Native FAB I/O: the runtime's plotfile/checkpoint data mover.
//
// TPU-native equivalent of FBoxLib's fabio layer (fabio_ml_multifab_write_d,
// consumed at reference varden.f90:568-573 / checkpoint.f90:44-48): writes
// BoxLib FAB records — a text header followed by Fortran-ordered float64
// data — doing the C->Fortran order transposition and file I/O in native
// code, off the Python hot path. Loaded via ctypes (varden_tpu/io/native.py).
//
// Build: make -C csrc   (produces libvardenio.so)

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <vector>

extern "C" {

// Transpose a C-ordered (ncomp, n0, n1[, n2]) array into FAB layout
// (component-major, x-fastest Fortran order) and append to an open file
// after the given text header. Returns 0 on success.
int varden_write_fab(const char* path, const char* header,
                     const double* data, const int64_t* shape,
                     int ndim, int64_t ncomp) {
    FILE* f = std::fopen(path, "wb");
    if (!f) return 1;
    if (std::fputs(header, f) == EOF) { std::fclose(f); return 2; }

    int64_t n0 = shape[0];
    int64_t n1 = ndim > 1 ? shape[1] : 1;
    int64_t n2 = ndim > 2 ? shape[2] : 1;
    int64_t cells = n0 * n1 * n2;

    std::vector<double> buf(static_cast<size_t>(cells));
    for (int64_t c = 0; c < ncomp; ++c) {
        const double* src = data + c * cells;
        // C order: src[i0*n1*n2 + i1*n2 + i2]; Fortran: dst[i2*n1*n0 + i1*n0 + i0]
        for (int64_t i0 = 0; i0 < n0; ++i0) {
            for (int64_t i1 = 0; i1 < n1; ++i1) {
                const double* row = src + (i0 * n1 + i1) * n2;
                double* col = buf.data() + i1 * n0 + i0;
                for (int64_t i2 = 0; i2 < n2; ++i2) {
                    col[i2 * n1 * n0] = row[i2];
                }
            }
        }
        if (std::fwrite(buf.data(), sizeof(double), cells, f)
            != static_cast<size_t>(cells)) {
            std::fclose(f);
            return 3;
        }
    }
    std::fclose(f);
    return 0;
}

// Read back one FAB record's data section (after `offset` bytes of header),
// un-transposing into C order. Returns 0 on success.
int varden_read_fab(const char* path, int64_t offset, double* out,
                    const int64_t* shape, int ndim, int64_t ncomp) {
    FILE* f = std::fopen(path, "rb");
    if (!f) return 1;
    if (std::fseek(f, static_cast<long>(offset), SEEK_SET) != 0) {
        std::fclose(f);
        return 2;
    }
    int64_t n0 = shape[0];
    int64_t n1 = ndim > 1 ? shape[1] : 1;
    int64_t n2 = ndim > 2 ? shape[2] : 1;
    int64_t cells = n0 * n1 * n2;
    std::vector<double> buf(static_cast<size_t>(cells));
    for (int64_t c = 0; c < ncomp; ++c) {
        if (std::fread(buf.data(), sizeof(double), cells, f)
            != static_cast<size_t>(cells)) {
            std::fclose(f);
            return 3;
        }
        double* dst = out + c * cells;
        for (int64_t i0 = 0; i0 < n0; ++i0) {
            for (int64_t i1 = 0; i1 < n1; ++i1) {
                double* row = dst + (i0 * n1 + i1) * n2;
                const double* col = buf.data() + i1 * n0 + i0;
                for (int64_t i2 = 0; i2 < n2; ++i2) {
                    row[i2] = col[i2 * n1 * n0];
                }
            }
        }
    }
    std::fclose(f);
    return 0;
}

}  // extern "C"
