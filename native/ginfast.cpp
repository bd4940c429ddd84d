// Native host-side parsing kernels for ginfinity_tpu.
//
// The device compute path is JAX/XLA/Pallas; this library accelerates the
// host preprocessing hot loop (dot-bracket scanning), which is the only
// first-party work that cannot be vectorized with NumPy.  Exposed via
// ctypes (ginfinity_tpu/utils/native.py).
//
// Build: make -C native  (produces libginfast.so)

#include <cstdint>
#include <vector>

extern "C" {

// Extended dot-bracket pair-table scan.
// Supports '.', '()', '[]', '{}', '<>' and letter pairs A..Z / a..z.
// Writes pt[i] = partner index or -1. Returns 0 on success, nonzero on
// malformed input (mirrors utils.py:144-177 validation semantics).
int gf_pair_table(const char* s, int n, int32_t* pt) {
    // 4 bracket families + 26 letter families.
    std::vector<int32_t> stacks[30];
    for (int i = 0; i < n; ++i) pt[i] = -1;
    for (int i = 0; i < n; ++i) {
        const char c = s[i];
        int open_slot = -1, close_slot = -1;
        switch (c) {
            case '.': continue;
            case '(': open_slot = 0; break;
            case '[': open_slot = 1; break;
            case '{': open_slot = 2; break;
            case '<': open_slot = 3; break;
            case ')': close_slot = 0; break;
            case ']': close_slot = 1; break;
            case '}': close_slot = 2; break;
            case '>': close_slot = 3; break;
            default:
                if (c >= 'A' && c <= 'Z') open_slot = 4 + (c - 'A');
                else if (c >= 'a' && c <= 'z') close_slot = 4 + (c - 'a');
                else return 1;  // not dot-bracket
        }
        if (open_slot >= 0) {
            stacks[open_slot].push_back(i);
        } else {
            auto& st = stacks[close_slot];
            if (st.empty()) return 2;  // unmatched closer
            const int32_t j = st.back();
            st.pop_back();
            pt[i] = j;
            pt[j] = i;
        }
    }
    for (auto& st : stacks)
        if (!st.empty()) return 3;  // unmatched opener
    return 0;
}

}  // extern "C"
