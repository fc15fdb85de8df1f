// Minimal glm-compatible shim for the headless cross-validation build.
// The reference vendors glm as an (un-checked-out) git submodule
// (.gitmodules); this supplies just the subset its core + CPU backend
// use, with glm's exact conventions where behavior matters:
// column-major mat4, translate/scale/rotate composing on the RIGHT
// (m * T), eulerAngleXYZ = Rx * Ry * Rz, reflect(I, N) = I - 2 dot(N,I) N.
#pragma once

#include <cmath>

namespace glm
{

// ---------------------------------------------------------------- vectors

struct vec2
{
    float x = 0.0f, y = 0.0f;
    vec2() = default;
    vec2(float a, float b) : x(a), y(b) {}
    explicit vec2(float s) : x(s), y(s) {}
    vec2& operator+=(const vec2& o) { x += o.x; y += o.y; return *this; }
    vec2& operator-=(const vec2& o) { x -= o.x; y -= o.y; return *this; }
    vec2& operator*=(float s) { x *= s; y *= s; return *this; }
};

inline vec2 operator+(vec2 a, const vec2& b) { return a += b; }
inline vec2 operator-(vec2 a, const vec2& b) { return a -= b; }
inline vec2 operator*(vec2 a, float s) { return a *= s; }
inline vec2 operator*(float s, vec2 a) { return a *= s; }
inline vec2 operator-(const vec2& a) { return vec2{-a.x, -a.y}; }

struct vec4;

struct vec3
{
    union { float x; float r; };
    union { float y; float g; };
    union { float z; float b; };
    vec3() : x(0.0f), y(0.0f), z(0.0f) {}
    vec3(float a, float b_, float c) : x(a), y(b_), z(c) {}
    // glm's single-scalar ctor splats (explicit in glm too, but list-init
    // glm::vec3{0.0f} resolves to it).
    explicit vec3(float s) : x(s), y(s), z(s) {}
    inline vec3(const vec4& v);  // truncating conversion (implicit in glm)
    float& operator[](int i) { return (&x)[i]; }
    const float& operator[](int i) const { return (&x)[i]; }
    vec3& operator+=(const vec3& o) { x += o.x; y += o.y; z += o.z; return *this; }
    vec3& operator-=(const vec3& o) { x -= o.x; y -= o.y; z -= o.z; return *this; }
    vec3& operator*=(const vec3& o) { x *= o.x; y *= o.y; z *= o.z; return *this; }
    vec3& operator*=(float s) { x *= s; y *= s; z *= s; return *this; }
    vec3& operator/=(float s) { x /= s; y /= s; z /= s; return *this; }
};

inline vec3 operator+(vec3 a, const vec3& b) { return a += b; }
inline vec3 operator-(vec3 a, const vec3& b) { return a -= b; }
inline vec3 operator*(vec3 a, const vec3& b) { return a *= b; }
inline vec3 operator*(vec3 a, float s) { return a *= s; }
inline vec3 operator*(float s, vec3 a) { return a *= s; }
inline vec3 operator/(vec3 a, float s) { return a /= s; }
inline vec3 operator/(vec3 a, const vec3& b)
{
    return vec3{a.x / b.x, a.y / b.y, a.z / b.z};
}
inline vec3 operator-(const vec3& a) { return vec3{-a.x, -a.y, -a.z}; }

struct vec4
{
    float x = 0.0f, y = 0.0f, z = 0.0f, w = 0.0f;
    vec4() = default;
    vec4(float a, float b, float c, float d) : x(a), y(b), z(c), w(d) {}
    explicit vec4(float s) : x(s), y(s), z(s), w(s) {}
    vec4(const vec3& v, float d) : x(v.x), y(v.y), z(v.z), w(d) {}
    float& operator[](int i) { return (&x)[i]; }
    const float& operator[](int i) const { return (&x)[i]; }
    vec4& operator+=(const vec4& o)
    {
        x += o.x; y += o.y; z += o.z; w += o.w;
        return *this;
    }
    vec4& operator*=(float s) { x *= s; y *= s; z *= s; w *= s; return *this; }
};

inline vec4 operator+(vec4 a, const vec4& b) { return a += b; }
inline vec4 operator*(vec4 a, float s) { return a *= s; }
inline vec4 operator*(float s, vec4 a) { return a *= s; }

inline vec3::vec3(const vec4& v) : x(v.x), y(v.y), z(v.z) {}

// --------------------------------------------------------------- functions

inline float dot(const vec2& a, const vec2& b) { return a.x * b.x + a.y * b.y; }
inline float dot(const vec3& a, const vec3& b)
{
    return a.x * b.x + a.y * b.y + a.z * b.z;
}
inline vec3 cross(const vec3& a, const vec3& b)
{
    return vec3{a.y * b.z - a.z * b.y,
                a.z * b.x - a.x * b.z,
                a.x * b.y - a.y * b.x};
}
inline float length(const vec2& v) { return std::sqrt(dot(v, v)); }
inline float length(const vec3& v) { return std::sqrt(dot(v, v)); }
inline vec2 normalize(const vec2& v) { return v * (1.0f / length(v)); }
inline vec3 normalize(const vec3& v) { return v / length(v); }

inline float min(float a, float b) { return b < a ? b : a; }
inline float max(float a, float b) { return a < b ? b : a; }
inline vec3 min(const vec3& a, const vec3& b)
{
    return vec3{min(a.x, b.x), min(a.y, b.y), min(a.z, b.z)};
}
inline vec3 max(const vec3& a, const vec3& b)
{
    return vec3{max(a.x, b.x), max(a.y, b.y), max(a.z, b.z)};
}
inline float abs(float v) { return std::fabs(v); }
inline vec3 abs(const vec3& v)
{
    return vec3{std::fabs(v.x), std::fabs(v.y), std::fabs(v.z)};
}
inline float sqrt(float v) { return std::sqrt(v); }
inline vec3 sqrt(const vec3& v)
{
    return vec3{std::sqrt(v.x), std::sqrt(v.y), std::sqrt(v.z)};
}
inline float pow(float base, float exp) { return std::pow(base, exp); }
inline float clamp(float v, float lo, float hi)
{
    return v < lo ? lo : (hi < v ? hi : v);
}
inline float radians(float deg) { return deg * 0.01745329251994329577f; }
inline vec3 radians(const vec3& deg)
{
    return vec3{radians(deg.x), radians(deg.y), radians(deg.z)};
}
// glm::reflect(I, N) = I - 2 * dot(N, I) * N
inline vec3 reflect(const vec3& I, const vec3& N)
{
    return I - 2.0f * dot(N, I) * N;
}

// --------------------------------------------------------------- matrices

// Column-major, like glm: m[c] is column c; (m * v)[r] = sum_c m[c][r]*v[c].
struct mat4
{
    vec4 c[4];
    mat4() = default;
    explicit mat4(float d)
    {
        c[0] = vec4{d, 0, 0, 0};
        c[1] = vec4{0, d, 0, 0};
        c[2] = vec4{0, 0, d, 0};
        c[3] = vec4{0, 0, 0, d};
    }
    vec4& operator[](int i) { return c[i]; }
    const vec4& operator[](int i) const { return c[i]; }
};

inline vec4 operator*(const mat4& m, const vec4& v)
{
    vec4 out;
    for (int r = 0; r < 4; ++r)
        out[r] = m[0][r] * v.x + m[1][r] * v.y + m[2][r] * v.z
               + m[3][r] * v.w;
    return out;
}

inline mat4 operator*(const mat4& a, const mat4& b)
{
    mat4 out;
    for (int i = 0; i < 4; ++i)
        out[i] = a * b[i];
    return out;
}

inline mat4 transpose(const mat4& m)
{
    mat4 out;
    for (int i = 0; i < 4; ++i)
        for (int j = 0; j < 4; ++j)
            out[i][j] = m[j][i];
    return out;
}

// General 4x4 inverse by cofactor expansion (glm::inverse semantics).
inline mat4 inverse(const mat4& m)
{
    // Flatten row-major for readability: a[r][c] = m[c][r].
    float a[4][4];
    for (int r = 0; r < 4; ++r)
        for (int col = 0; col < 4; ++col)
            a[r][col] = m[col][r];

    auto det3 = [](float a0, float a1, float a2,
                   float b0, float b1, float b2,
                   float c0, float c1, float c2) {
        return a0 * (b1 * c2 - b2 * c1)
             - a1 * (b0 * c2 - b2 * c0)
             + a2 * (b0 * c1 - b1 * c0);
    };

    float cof[4][4];
    for (int r = 0; r < 4; ++r)
        for (int col = 0; col < 4; ++col)
        {
            float sub[3][3];
            for (int i = 0, si = 0; i < 4; ++i)
            {
                if (i == r) continue;
                for (int j = 0, sj = 0; j < 4; ++j)
                {
                    if (j == col) continue;
                    sub[si][sj++] = a[i][j];
                }
                ++si;
            }
            float mdet = det3(sub[0][0], sub[0][1], sub[0][2],
                              sub[1][0], sub[1][1], sub[1][2],
                              sub[2][0], sub[2][1], sub[2][2]);
            cof[r][col] = (((r + col) & 1) ? -mdet : mdet);
        }
    float det = a[0][0] * cof[0][0] + a[0][1] * cof[0][1]
              + a[0][2] * cof[0][2] + a[0][3] * cof[0][3];
    float inv_det = 1.0f / det;
    mat4 out;
    // inverse = adjugate / det; adjugate = transpose of cofactor (row-major)
    // -> column-major out[c][r] = cof[c][r] * inv_det... careful:
    // inv_rowmajor[r][c] = cof[c][r] * inv_det; out[col][row] stores
    // inv_rowmajor[row][col] = cof[col][row] * inv_det.
    for (int col = 0; col < 4; ++col)
        for (int r = 0; r < 4; ++r)
            out[col][r] = cof[col][r] * inv_det;
    return out;
}

struct mat3
{
    vec3 c[3];
    mat3() = default;
    explicit mat3(const mat4& m)
    {
        for (int i = 0; i < 3; ++i)
            c[i] = vec3{m[i][0], m[i][1], m[i][2]};
    }
    vec3& operator[](int i) { return c[i]; }
    const vec3& operator[](int i) const { return c[i]; }
};

inline vec3 operator*(const mat3& m, const vec3& v)
{
    vec3 out;
    for (int r = 0; r < 3; ++r)
        out[r] = m[0][r] * v.x + m[1][r] * v.y + m[2][r] * v.z;
    return out;
}

// gtc/matrix_transform: compose on the RIGHT (glm semantics).
inline mat4 translate(const mat4& m, const vec3& v)
{
    mat4 t{1.0f};
    t[3] = vec4{v, 1.0f};
    return m * t;
}

inline mat4 scale(const mat4& m, const vec3& v)
{
    mat4 s{1.0f};
    s[0][0] = v.x;
    s[1][1] = v.y;
    s[2][2] = v.z;
    return m * s;
}

inline mat4 rotate(const mat4& m, float angle, const vec3& axis_in)
{
    const vec3 a = normalize(axis_in);
    const float cs = std::cos(angle), sn = std::sin(angle);
    const vec3 t = a * (1.0f - cs);
    mat4 r{1.0f};
    r[0][0] = cs + t.x * a.x;
    r[0][1] = t.x * a.y + sn * a.z;
    r[0][2] = t.x * a.z - sn * a.y;
    r[1][0] = t.y * a.x - sn * a.z;
    r[1][1] = cs + t.y * a.y;
    r[1][2] = t.y * a.z + sn * a.x;
    r[2][0] = t.z * a.x + sn * a.y;
    r[2][1] = t.z * a.y - sn * a.x;
    r[2][2] = cs + t.z * a.z;
    return m * r;
}

inline mat4 lookAtRH(const vec3& eye, const vec3& center, const vec3& up)
{
    const vec3 f = normalize(center - eye);
    const vec3 s = normalize(cross(f, up));
    const vec3 u = cross(s, f);
    mat4 out{1.0f};
    out[0][0] = s.x;  out[1][0] = s.y;  out[2][0] = s.z;
    out[0][1] = u.x;  out[1][1] = u.y;  out[2][1] = u.z;
    out[0][2] = -f.x; out[1][2] = -f.y; out[2][2] = -f.z;
    out[3][0] = -dot(s, eye);
    out[3][1] = -dot(u, eye);
    out[3][2] = dot(f, eye);
    return out;
}

inline mat4 perspectiveRH_ZO(float fovy, float aspect, float zNear,
                             float zFar)
{
    const float tanHalf = std::tan(fovy * 0.5f);
    mat4 out;  // zero
    out[0][0] = 1.0f / (aspect * tanHalf);
    out[1][1] = 1.0f / tanHalf;
    out[2][2] = zFar / (zNear - zFar);
    out[2][3] = -1.0f;
    out[3][2] = -(zFar * zNear) / (zFar - zNear);
    return out;
}

// gtx/euler_angles: eulerAngleXYZ(t1,t2,t3) = Rx(t1) * Ry(t2) * Rz(t3).
inline mat4 eulerAngleXYZ(float t1, float t2, float t3)
{
    mat4 rx{1.0f}, ry{1.0f}, rz{1.0f};
    const float c1 = std::cos(t1), s1 = std::sin(t1);
    const float c2 = std::cos(t2), s2 = std::sin(t2);
    const float c3 = std::cos(t3), s3 = std::sin(t3);
    rx[1][1] = c1;  rx[1][2] = s1;
    rx[2][1] = -s1; rx[2][2] = c1;
    ry[0][0] = c2;  ry[0][2] = -s2;
    ry[2][0] = s2;  ry[2][2] = c2;
    rz[0][0] = c3;  rz[0][1] = s3;
    rz[1][0] = -s3; rz[1][1] = c3;
    return rx * (ry * rz);
}

}  // namespace glm
