// CRASH:timeout
module top(input [3:0] a, output reg [3:0] y);
  always @* begin
    i = 0;
    while(i < 4) begin
      y[i] = a[i];
    end
  end
endmodule
